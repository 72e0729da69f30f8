from .surface import get_surface_vf, triangle_edge_neighbors
from .io import load_veg, save_veg, load_obj, save_obj
from .tetmesh import TetMesh
from .spheres import icosphere, tet_sphere, load_template_sphere
