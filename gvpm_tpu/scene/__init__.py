from .builder import SceneBuilder, look_at  # noqa: F401
from .types import Scene  # noqa: F401
from .intersect import Hit, intersect, occluded  # noqa: F401
from . import camera  # noqa: F401
