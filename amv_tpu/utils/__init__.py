from .profiling import stage_timer, trace, StageTimes  # noqa: F401
