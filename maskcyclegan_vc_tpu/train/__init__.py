from maskcyclegan_vc_tpu.train.state import TrainConfig, TrainState, create_train_state
from maskcyclegan_vc_tpu.train.step import make_train_step

__all__ = ["TrainConfig", "TrainState", "create_train_state", "make_train_step"]
