from uvtrace.geometry.mesh import TriangleMesh
from uvtrace.geometry.gltf import load_glb
from uvtrace.geometry.procedural import make_box_room
