from .datasets import RightLaneDataset
from .modules import SimulatorDataModule, TwoDomainDataModule, TwoDomainMMEDataModule
