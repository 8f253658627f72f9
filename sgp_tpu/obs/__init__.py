from sgp_tpu.obs.monitor import ResidualWhitenessMonitor
from sgp_tpu.obs.profiling import (StepTimer, Throughput, profile_trace,
                                   time_fn)

__all__ = ["ResidualWhitenessMonitor", "StepTimer", "Throughput",
           "profile_trace", "time_fn"]
