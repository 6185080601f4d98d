from .image import load_image_rgb8, save_png  # noqa: F401
from .obj import load_obj  # noqa: F401
