"""State-category singletons (reference ``src/BalanceLaws/state_types.jl``).

Each category names a separate array allocated from the model's
``vars_state(category)`` schema; arrays are plain jnp arrays with layout
``[elem, node, nvars]``.
"""


class StateType:
    def __repr__(self):
        return type(self).__name__

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(self) is type(other)


class AbstractStateType(StateType):
    pass


class Prognostic(AbstractStateType):
    """Conserved variables q (reference: Prognostic)."""


class Primitive(AbstractStateType):
    """Primitive variables (used by FV reconstruction)."""


class Auxiliary(AbstractStateType):
    """Per-node auxiliary data (coords, reference state, precomputed)."""


class Gradient(AbstractStateType):
    """Variables whose gradient is required (pre-transform)."""


class GradientFlux(AbstractStateType):
    """Post-gradient fluxes sigma = tau(grad g)."""


class GradientLaplacian(AbstractStateType):
    """Variables whose Laplacian feeds hyperdiffusion."""


class Hyperdiffusive(AbstractStateType):
    """Hyperdiffusive fluxes (grad of Laplacian)."""


class UpwardIntegrals(AbstractStateType):
    """Quantities integrated upward along columns."""


class DownwardIntegrals(AbstractStateType):
    """Quantities integrated downward along columns."""


class Entropy(AbstractStateType):
    """Entropy variables (ESDG)."""
