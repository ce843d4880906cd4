from .mesh import make_mesh, local_device_count, shard_batch
from .dtypes import DTypePolicy, DEFAULT_POLICY
