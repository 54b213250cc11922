from .soup2d import Seg2D, build_segments, polyline_loop, polyline_chain  # noqa: F401
from .soup3d import Tri3D, build_triangles, box_tris  # noqa: F401
from . import queries2d, queries3d, sdf, obj_io  # noqa: F401
