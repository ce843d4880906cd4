from .sharding import make_train_mesh, shard_params, shard_train_batch
