from .schedules import step_lr, cosine_annealing_lr, make_optimizer
from .state import TrainState
from .supervised import make_supervised_train_step, SupervisedTrainer
from .diffusion import make_diffusion_train_step, DiffusionTrainer
from .gan import RCAGANTrainer, train_rca_gan
from .denoising_gan import DenoisingGANTrainer, train_denoising_gan
