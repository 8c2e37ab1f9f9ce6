from .color import post_process, post_process_jit  # noqa: F401
from .remap import remap_batch_jit, remap_image, remap_jit  # noqa: F401
from .sampling import INTERPOLATIONS, sample  # noqa: F401
