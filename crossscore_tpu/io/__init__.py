from crossscore_tpu.io.images import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    image_read,
    image_write,
    metric_map_read,
    metric_map_write,
    normalize_imagenet,
    denormalize_imagenet,
)
