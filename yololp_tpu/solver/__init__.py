from yololp_tpu.solver.build import (
    SolverConfig,
    accumulate_steps,
    ema_update,
    init_momentum,
    label_tree,
    lr_lambda,
    schedule,
    sgd_apply,
    warmup_steps,
)
