from crossscore_tpu.ops.jigsaw import jigsaw_to_image, image_to_jigsaw
from crossscore_tpu.ops.interpolate import (
    interpolate_bilinear_align_corners,
    interpolate_bicubic,
    resize_bilinear_antialias,
)
from crossscore_tpu.ops.metrics import (
    psnr,
    mse2psnr,
    abs2psnr,
    psnr2mse,
    correlation,
)
