from qdm_tpu.calib.stats import flatten_calib, RunningMeanMax  # noqa: F401
