from uvtrace.bvh.types import FlatBVH
from uvtrace.bvh.builder import build_bvh
