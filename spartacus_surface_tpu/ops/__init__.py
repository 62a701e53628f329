from .legendre_gauss import LegendreGauss
from .matrix import matmul, solve, inv, expm_pade7
from .layer_matrices import layer_matrices, combine_layers
