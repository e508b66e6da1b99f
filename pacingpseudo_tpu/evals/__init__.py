from .dice import compute_dice, dice_per_class_jax, compute_dice_hard
from .hd import hd95, hd, surface_distances
