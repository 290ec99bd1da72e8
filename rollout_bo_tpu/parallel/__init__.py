from rollout_bo_tpu.parallel import mesh, sharded
from rollout_bo_tpu.parallel.mesh import make_mesh
