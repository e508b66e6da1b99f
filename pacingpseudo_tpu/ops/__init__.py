from .resize import (
    bilinear_resize_align_corners,
    upsample2x_align_corners,
)
