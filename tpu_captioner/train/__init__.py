from tpu_captioner.train.model import CaptionModel
from tpu_captioner.train.state import TrainState, make_optimizer
from tpu_captioner.train.steps import make_train_step, make_eval_step
