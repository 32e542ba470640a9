from ducosy_tpu.train.state import CycleGANState, create_state  # noqa: F401
from ducosy_tpu.train.step import make_train_step, make_val_step  # noqa: F401
