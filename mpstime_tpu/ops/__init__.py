from .decomp import split_bond_left, split_bond_right
from .env import (build_left_envs, build_right_envs, env_step_left,
                  env_step_right, boundary_env)
from .bond_update import apply_update, bond_yhat, kld_loss_grad, mse_loss_grad

__all__ = [
    "split_bond_left", "split_bond_right",
    "build_left_envs", "build_right_envs", "env_step_left", "env_step_right",
    "boundary_env",
    "apply_update", "bond_yhat", "kld_loss_grad", "mse_loss_grad",
]
