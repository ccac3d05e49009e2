from mech_nn_discovery_pde_tpu.parallel.mesh import make_mesh, batch_sharding, replicate
from mech_nn_discovery_pde_tpu.parallel import halo
