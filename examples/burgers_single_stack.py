"""3-D Burgers + tracer equations in a single element stack (reference
tutorials/Atmos/burgers_single_stack.jl).

Demonstrates implementing a NEW user-defined BalanceLaw against the
public interface: prognostic (rho, rhou, rhocT); advective first-order
fluxes; anisotropic diffusive second-order fluxes (Diag(mu_h, mu_h,
mu_v) grad u, Diag(alpha_h, alpha_h, alpha_v) grad rhocT); horizontal
divergence damping -nu_d grad_h(div_h rhou) written as a diagonal
diffusive flux (reference :295-307); Rayleigh friction returning
horizontal momentum to a target profile (reference :309-332);
Dirichlet heated bottom plate + insulating top — on a SingleStack
configuration.  Gaussian noise in the initial horizontal momentum is
smoothed by friction + diffusion within the 1-s run.  Smoke::

    python examples/burgers_single_stack.py --timeend 0.2 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.balance_laws import (Auxiliary, BalanceLaw,
                                             Gradient, GradientFlux,
                                             Prognostic)
from climatemachine_tpu.dg.numerical_fluxes import (
    CentralNumericalFluxFirstOrder)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import single_stack_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.utils.variables import VarSpec


class BurgersEquation(BalanceLaw):
    """(reference burgers_single_stack.jl:17-36 equations, :130-165
    parameters)"""

    def __init__(self, c=1.0, mu_v=1e-4, mu_h=1.0, alpha_v=1e-2,
                 alpha_h=1.0, sigma=5e-2, gamma=5.0, zmax=1.0,
                 T_init=295.15, T_bottom=300.0, nu_d=1.0, seed=0):
        self.c, self.gamma, self.zmax = c, gamma, zmax
        self.mu_v, self.mu_h = mu_v, mu_h
        self.alpha_v, self.alpha_h = alpha_v, alpha_h
        self.sigma, self.T_init, self.T_bottom = sigma, T_init, T_bottom
        self.nu_d, self.seed = nu_d, seed

    def vars_state(self, state_type):
        if isinstance(state_type, Prognostic):
            return VarSpec(rho=1, rhou=(3,), rhocT=1)
        if isinstance(state_type, Auxiliary):
            return VarSpec(coord=3)
        if isinstance(state_type, Gradient):
            return VarSpec(rhocT=1, u=(3,), rhou=(3,))
        if isinstance(state_type, GradientFlux):
            # alpha grad(rhocT), mu grad(u), nu_d * horizontal divergence
            return VarSpec(alpha_grad_rhocT=(3,), mu_gradu=(3, 3),
                           nud_D=1)
        return VarSpec()

    @property
    def prog_spec(self):
        return self.vars_state(Prognostic())

    @property
    def aux_spec(self):
        return self.vars_state(Auxiliary())

    @property
    def grad_spec(self):
        return self.vars_state(Gradient())

    @property
    def gf_spec(self):
        return self.vars_state(GradientFlux())

    # --- init (reference :246-264) ------------------------------------------
    def init_state_prognostic(self, coords, aux, t):
        z = coords[..., 2]
        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        prof = 1.0 - 4.0 * (z - self.zmax / 2) ** 2
        rhou = prof + self.sigma * jax.random.normal(k1, z.shape, z.dtype)
        rhov = prof + self.sigma * jax.random.normal(k2, z.shape, z.dtype)
        rho = jnp.ones_like(z)
        q = self.prog_spec.pack(
            {"rho": rho, "rhocT": rho * self.c * self.T_init},
            batch_shape=z.shape)
        return self.prog_spec.set(
            q, "rhou", jnp.stack([rhou, rhov, jnp.zeros_like(z)], axis=-1))

    # --- first order (reference :337-350) -----------------------------------
    def flux_first_order(self, q, aux, t):
        s = self.prog_spec
        rho = s.get(q, "rho")
        rhou = s.get(q, "rhou")
        rhocT = s.get(q, "rhocT")
        u = rhou / rho[..., None]
        F = jnp.zeros(q.shape[:-1] + (3, s.num), dtype=q.dtype)
        F = s.set(F, "rho", rhou)
        F = s.set(F, "rhou", rhou[..., :, None] * u[..., None, :])
        return s.set(F, "rhocT", u * rhocT[..., None])

    def wavespeed(self, nrm, q, aux, t):
        s = self.prog_spec
        u = s.get(q, "rhou") / s.get(q, "rho")[..., None]
        return jnp.abs(jnp.sum(u * nrm, axis=-1))

    # --- gradients (reference :269-307) -------------------------------------
    def compute_gradient_argument(self, q, aux, t):
        s, gs = self.prog_spec, self.grad_spec
        rhou = s.get(q, "rhou")
        u = rhou / s.get(q, "rho")[..., None]
        g = jnp.zeros(q.shape[:-1] + (gs.num,), dtype=q.dtype)
        g = gs.set(g, "rhocT", s.get(q, "rhocT"))
        g = gs.set(g, "u", u)
        return gs.set(g, "rhou", rhou)

    def compute_gradient_flux(self, grad_g, q, aux, t):
        gs, fs = self.grad_spec, self.gf_spec
        grad_rhocT = grad_g[..., :, gs.index("rhocT")][..., 0]
        grad_u = grad_g[..., :, gs.index("u")]       # [..., 3(coord), 3]
        grad_rhou = grad_g[..., :, gs.index("rhou")]
        alpha = jnp.asarray([self.alpha_h, self.alpha_h, self.alpha_v],
                            dtype=q.dtype)
        mu = jnp.asarray([self.mu_h, self.mu_h, self.mu_v], dtype=q.dtype)
        # horizontal divergence = tr(grad rhou) - zhat' grad rhou zhat
        div_h = grad_rhou[..., 0, 0] + grad_rhou[..., 1, 1]
        gf = jnp.zeros(q.shape[:-1] + (fs.num,), dtype=q.dtype)
        gf = fs.set(gf, "alpha_grad_rhocT", alpha * grad_rhocT)
        gf = fs.set(gf, "mu_gradu", mu[:, None] * grad_u)
        return fs.set(gf, "nud_D", self.nu_d * div_h)

    # --- second order (reference :356-368) ----------------------------------
    def flux_second_order(self, q, gf, hyper, aux, t):
        s, fs = self.prog_spec, self.gf_spec
        F = jnp.zeros(q.shape[:-1] + (3, s.num), dtype=q.dtype)
        F = s.set(F, "rhocT", -fs.get(gf, "alpha_grad_rhocT"))
        Fm = -fs.get(gf, "mu_gradu")
        # -Diag(nud D, nud D, 0): horizontal divergence damping flux
        D = fs.get(gf, "nud_D")
        Fm = Fm.at[..., 0, 0].add(-D).at[..., 1, 1].add(-D)
        return s.set(F, "rhou", Fm)

    # --- Rayleigh friction toward the mean profile (reference :309-332) -----
    def source(self, q, gf, aux, t):
        s = self.prog_spec
        z = self.aux_spec.get(aux, "coord")[..., 2]
        rho = s.get(q, "rho")
        prof = 0.5 - 2.0 * (z - self.zmax / 2) ** 2
        target = rho[..., None] * jnp.stack(
            [prof, prof, jnp.zeros_like(prof)], axis=-1)
        d = s.get(q, "rhou") - target
        d = d.at[..., 2].set(0.0)          # projection_tangential (flat)
        out = jnp.zeros_like(q)
        return s.set(out, "rhou", -self.gamma * d)

    # --- boundaries (reference :380-450) ------------------------------------
    def boundary_conditions(self):
        return ("bottom", "top")

    def boundary_state(self, tag, nrm, qM, auxM, t):
        s = self.prog_spec
        one = jnp.ones_like(s.get(qM, "rho"))
        qP = s.set(qM, "rho", 2.0 * one - s.get(qM, "rho"))
        qP = s.set(qP, "rhou", -s.get(qM, "rhou"))
        if tag == 1:       # bottom: T = T_bottom (Dirichlet)
            qP = s.set(qP, "rhocT",
                       2.0 * one * self.c * self.T_bottom
                       - s.get(qM, "rhocT"))
        return qP, auxM

    def boundary_state_gradient_flux(self, tag, nrm, gfM, qM, auxM, t):
        if tag == 2:       # top: alpha grad(rhocT) . n = flux_top = 0
            fs = self.gf_spec
            return fs.set(gfM, "alpha_grad_rhocT",
                          jnp.zeros_like(fs.get(gfM, "alpha_grad_rhocT")))
        return gfM


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nelem", type=int, default=10)
    p.add_argument("--variant", choices=["plain", "bjfnk", "fvm"],
                   default="plain",
                   help="plain: explicit LSRK (burgers_single_stack.jl); "
                   "bjfnk: vertical dynamics implicit via JFNK at the "
                   "ADVECTIVE dt, not the diffusive one "
                   "(burgers_single_stack_bjfnk.jl HEVISolverType); "
                   "fvm: vertical finite-volume N=(poly,0) with FVLinear "
                   "reconstruction (burgers_single_stack_fvm.jl)")
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=1.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    bl = BurgersEquation()
    dtype = np.float64 if args.platform == "cpu" else np.float32
    topo = single_stack_topology(1.0, 1.0,
                                 np.linspace(0, bl.zmax, args.nelem + 1))
    if args.variant == "fvm":
        # vertical finite volume: N = (poly, 0) + FVLinear reconstruction
        # (reference burgers_single_stack_fvm.jl:468-485)
        from climatemachine_tpu.dg.fv import DGFVModel, FVLinear
        grid = make_grid(topo, (args.poly, args.poly, 0), dtype=dtype)
        dg = DGFVModel(bl, grid, reconstruction=FVLinear(),
                       numerical_flux_first_order=
                       CentralNumericalFluxFirstOrder())
    else:
        grid = make_grid(topo, args.poly, dtype=dtype)
        dg = DGModel(bl, grid, numerical_flux_first_order=
                     CentralNumericalFluxFirstOrder())
    q, aux = init_ode_state(dg)
    # Fourier + Courant bounds (reference :470-477)
    delta = float(min_node_distance(grid))
    dt_fourier = 0.5 * delta ** 2 / max(bl.alpha_h, bl.mu_h, bl.nu_d)
    if args.variant == "bjfnk":
        # vertical dynamics (incl. its diffusive limit) implicit: only
        # the Courant bound applies (reference
        # burgers_single_stack_bjfnk.jl HEVISolverType + ARK2GKC)
        from climatemachine_tpu.driver.solver_types import HEVISolverType
        dt = 0.5 * delta
        hevi = HEVISolverType()
        solver = hevi.make(dg, q, aux, dt)
        step = solver.step
    else:
        dt = min(dt_fourier, 0.5 * delta)
        solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
        step = jax.jit(solver.step)
    nsteps = max(int(args.timeend / dt), 1)
    print(f"variant = {args.variant}, dt = {dt:.2e} s, "
          f"elements = {grid.nelem}, steps = {nsteps}")
    s = bl.prog_spec
    u0 = s.get(q, "rhou")[..., 0] / s.get(q, "rho")
    # noise = deviation from the horizontal mean at each node level
    noise0 = float(jnp.std(u0 - jnp.mean(u0, axis=0, keepdims=True)))
    t = 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    q.block_until_ready()
    u1 = s.get(q, "rhou")[..., 0] / s.get(q, "rho")
    noise1 = float(jnp.std(u1 - jnp.mean(u1, axis=0, keepdims=True)))
    T = s.get(q, "rhocT") / (bl.c * s.get(q, "rho"))
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"u-noise std: {noise0:.4f} -> {noise1:.4f}   "
          f"T range: [{float(jnp.min(T)):.2f}, {float(jnp.max(T)):.2f}] "
          f"(bottom heating toward {bl.T_bottom})")


if __name__ == "__main__":
    main()
