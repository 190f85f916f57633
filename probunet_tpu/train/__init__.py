from probunet_tpu.train.state import TrainState, create_train_state  # noqa: F401
from probunet_tpu.train.steps import (  # noqa: F401
    make_probunet_train_step,
    make_probunet_train_multistep,
    make_probunet_eval_step,
    make_deterministic_train_step,
    make_deterministic_eval_step,
    make_sample_fn,
    make_crps_eval_fn,
    make_edm_train_step,
    make_edm_eval_step,
    make_edm_sample_fn,
    make_edm_crps_eval_fn,
    edm_sample,
    beta_schedule,
)
