from dune_pdelab_tpu.fe.quadrature import (
    gauss_legendre, gauss_lobatto, cube_rule, simplex_rule, quadrature_rule,
)
from dune_pdelab_tpu.fe.basis import (
    FiniteElement, QkFEM, QkDGFEM, PkFEM, PkDGFEM, P0FEM, LegendreDGFEM,
    RannacherTurekFEM, MonomialDGFEM, OPBFEM,
)
