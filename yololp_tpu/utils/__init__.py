from yololp_tpu.utils.config import Config, DotDict
