from .schedules import (
    linear_lr_decay,
    cosine_lr_decay,
    poly_lr_decay,
    make_lr_schedule,
    gaussian_ramp_up,
    memory_momentum,
)
