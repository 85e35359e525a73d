from faldoi_tpu.io.flo import read_flo, write_flo  # noqa: F401
from faldoi_tpu.io.image import (  # noqa: F401
    read_image_split,
    read_image_gray,
    rgb_to_gray,
    save_image_float,
    save_image_int,
)
