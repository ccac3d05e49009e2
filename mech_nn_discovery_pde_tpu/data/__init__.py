from mech_nn_discovery_pde_tpu.data import generate
from mech_nn_discovery_pde_tpu.data.datasets import (
    BurgersDataset,
    KamaniDataset,
    ReactDiffDataset,
    SineDataset,
    PatchLoader,
)
