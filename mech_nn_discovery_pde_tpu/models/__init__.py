from mech_nn_discovery_pde_tpu.models.resnet import ResNet, ResNet1D, ResNet2D, ResNet3D
from mech_nn_discovery_pde_tpu.models.paramnet import ParamNet
