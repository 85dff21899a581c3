"""Legacy alias package (parity: python/vshade/__init__.py)."""
from vulkan_forge import *  # noqa: F401,F403
from vulkan_forge import Renderer, __version__  # noqa: F401
