from sgp_tpu.obs.profiling import (StepTimer, Throughput, profile_trace,
                                   time_fn)

__all__ = ["StepTimer", "Throughput", "profile_trace", "time_fn"]
