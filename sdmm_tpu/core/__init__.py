from . import frame, warp, spectrum, aabb
