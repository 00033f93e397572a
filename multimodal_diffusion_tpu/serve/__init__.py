from .runner import BatchScheduler, InferenceRunner  # noqa: F401
