from yololp_tpu.losses.loss import LossConfig, compute_loss, varifocal_loss, wing_loss
from yololp_tpu.losses.distill import distill_loss, distill_weight_schedule
