from sgp_tpu.data.datasets.base import TabularDataset
from sgp_tpu.data.datasets.synthetic import SyntheticDiffusion
from sgp_tpu.data.datasets.metr_la import MetrLA
from sgp_tpu.data.datasets.pems_bay import PemsBay
from sgp_tpu.data.datasets.pv_us import PvUS
from sgp_tpu.data.datasets.cer_en import CEREn

__all__ = ["TabularDataset", "SyntheticDiffusion", "MetrLA", "PemsBay",
           "PvUS", "CEREn"]
