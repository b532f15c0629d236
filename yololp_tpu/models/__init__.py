from yololp_tpu.models.yolo import BACKBONES, NECKS, Model, build_model, scaled_lists
from yololp_tpu.models.effidehead import Detect, HeadTrainOutput
