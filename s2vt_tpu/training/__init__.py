from s2vt_tpu.training.callbacks import EarlyStopping, ReduceLROnPlateau  # noqa: F401
from s2vt_tpu.training.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401
from s2vt_tpu.training.loop import Trainer, batch_loss  # noqa: F401
