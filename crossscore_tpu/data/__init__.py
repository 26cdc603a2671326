from crossscore_tpu.data.samplers import SamplerRandom, make_sampler
from crossscore_tpu.data.crop import get_crop_params, crop, CropperSame, CropperSeparate, make_cropper
from crossscore_tpu.data.nvs_index import NvsDataset, NeighbourSelector, get_dataset
from crossscore_tpu.data.simple_reference import SimpleReference
from crossscore_tpu.data.loader import Loader
