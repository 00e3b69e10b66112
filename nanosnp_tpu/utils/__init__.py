from .profiling import maybe_profile, StageTimer
