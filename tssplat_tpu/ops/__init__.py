from .energy import (EnergyOps, build_energy_ops, deformation_gradients,
                     smooth_barrier_energy, energy_coeff_schedule,
                     barrier_order, laplacian_F)
