from crossscore_tpu.train.optim import make_optimizer, step_lr_schedule
from crossscore_tpu.train.step import TrainState, make_train_step, make_eval_step, create_train_state
