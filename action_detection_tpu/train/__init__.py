from .optim import make_optimizer, label_params, step_decay_schedule
from .trainer import (TrainState, LossWeights, make_loss_fn, make_train_step,
                      make_eval_step, create_train_state, select_head_subsets)
from .checkpoint import save_checkpoint, load_checkpoint, checkpoint_name
