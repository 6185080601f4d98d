from .camera import Camera  # noqa: F401
from .renderer import render_image  # noqa: F401
