from .mesh import make_mesh, sharded_align_step
