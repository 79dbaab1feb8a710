"""PDE problem base class — pure-functional physics layer.

TPU-native redesign of the reference's ``PDEBase``
(reference: pinnrl/pdes/pde_base.py:50-1562). Key differences:

- A PDE subclass defines a **point-wise residual** ``residual_pointwise(u, z,
  coeffs)`` where ``u: (dim+1,) -> scalar`` is the network restricted to one
  point and derivatives come from the forward-mode engine in
  ``pinnrl_tpu.ops.derivatives``. The batch residual is ``vmap`` of that —
  one fused XLA program instead of torch autograd chains.
- PDE coefficients are explicit: ``coeffs`` is a dict pytree. In inverse
  mode the trainable subset lives inside the optimized parameter pytree
  (no ``nn.ParameterDict`` registry needed — reference: pde_base.py:199-279);
  the non-trainable rest are static Python floats baked into the trace.
- ``compute_loss`` assembles residual/boundary/initial/smoothness/data terms
  with the reference's mode gating (``data_only`` zeroes physics;
  inverse/data modes force a non-zero data weight —
  reference: pde_base.py:1086-1235) and is fully jittable (static shapes,
  randomness via an explicit PRNG key).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pinnrl_tpu.config import PDESettings, TrainingConfig
from pinnrl_tpu.ops.derivatives import derivative_bundle
from pinnrl_tpu.ops.losses import apply_loss_fn
from pinnrl_tpu.sampling import (
    sample_adaptive,
    sample_residual_based,
    sample_stratified,
    sample_uniform,
)

PointFn = Callable[[jax.Array], jax.Array]
Coeffs = Dict[str, jax.Array]

# Populated by @register_pde; maps pde_type -> class.
PDE_CLASSES: Dict[str, type] = {}


def register_pde(cls):
    PDE_CLASSES[cls.pde_type] = cls
    return cls


class PDEBase:
    """Base PDE problem: physics, BC/IC targets, sampling, loss assembly."""

    pde_type = "base"
    # Coefficients this PDE reads, with defaults (overridden by settings.parameters).
    default_parameters: Dict[str, Any] = {}

    def __init__(
        self,
        settings: PDESettings,
        training: Optional[TrainingConfig] = None,
    ) -> None:
        self.settings = settings
        self.training = training
        self.dimension = int(settings.dimension)
        self.domain = [(float(lo), float(hi)) for lo, hi in settings.domain]
        self.time_domain = (float(settings.time_domain[0]), float(settings.time_domain[1]))
        self.parameters: Dict[str, Any] = {**self.default_parameters, **(settings.parameters or {})}

        # Inverse-problem machinery (reference: pde_base.py:199-214): the TRUE
        # values stay in ``self.parameters``; initial guesses seed the
        # trainable coeff pytree returned by ``init_coeffs``.
        self.trainable_parameters = list(settings.trainable_parameters or [])
        self._true_parameters = {k: float(self.parameters[k]) for k in self.trainable_parameters}
        self._initial_guesses = {
            k: float(settings.parameter_initial_guesses.get(k, self.parameters[k]))
            for k in self.trainable_parameters
        }

        # Observation data for inverse / data modes: tuple (x, t, u) arrays.
        self.observations: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
        if settings.observation_data is not None:
            self._load_observation_data(settings.observation_data)

        # BC/IC target closures (reference: pde_base.py:492-575).
        self.boundary_conditions: Dict[str, Callable] = {}
        for bc_type, bc_params in (settings.boundary_conditions or {}).items():
            self.boundary_conditions[bc_type] = self._create_boundary_condition(
                bc_type, bc_params or {}
            )
        if settings.initial_condition:
            self.boundary_conditions["initial"] = self._create_boundary_condition(
                "initial", settings.initial_condition
            )

        self.collocation_history: list = []
        # Optional stacked-jet fast path (ops/jet_mlp.py): a batched
        # (params, z) -> (value, streams) evaluator attached by
        # ``attach_fast_bundle`` once the model is known.
        self._fast_bundle_fn = None
        # Fused fwd+bwd Pallas residual-loss kernel (TPU only), attached by
        # ``attach_fused_residual_kernel``.
        self._fused_residual_loss = None
        self._validate_parameters()

    # ------------------------------------------------------------------ #
    # Factory
    # ------------------------------------------------------------------ #

    @staticmethod
    def create(pde_type: str, settings: PDESettings, training: Optional[TrainingConfig] = None):
        """Name-based factory (reference: pde_base.py:56-130)."""
        key = pde_type.lower().replace("-", "_").replace(" ", "_")
        key = {"heat_2d": "heat", "heat2d": "heat"}.get(key, key)
        aliases = {
            "heatequation": "heat",
            "waveequation": "wave",
            "burgersequation": "burgers",
            "kdvequation": "kdv",
            "convectionequation": "convection",
            "allencahn": "allen_cahn",
            "cahnhilliard": "cahn_hilliard",
            "blackscholes": "black_scholes",
            "pendulumequation": "pendulum",
        }
        key = aliases.get(key, key)
        if key not in PDE_CLASSES:
            raise ValueError(f"Unknown PDE type {pde_type!r}; valid: {sorted(PDE_CLASSES)}")
        return PDE_CLASSES[key](settings, training)

    # ------------------------------------------------------------------ #
    # Coefficients
    # ------------------------------------------------------------------ #

    def init_coeffs(self) -> Coeffs:
        """Trainable coefficient pytree seeded from initial guesses."""
        return {k: jnp.asarray(v, jnp.float32) for k, v in self._initial_guesses.items()}

    def coeff(self, coeffs: Optional[Coeffs], name: str, default: Any = None):
        """Live coefficient value: trainable pytree leaf if present, else the
        static config value (reference: pde_base.py:246-279)."""
        if coeffs is not None and name in coeffs:
            return coeffs[name]
        if name in self.parameters:
            val = self.parameters[name]
            return val if isinstance(val, (list, tuple)) else float(val)
        if default is not None:
            return default
        raise KeyError(f"PDE parameter {name!r} not configured and no default")

    def canonicalize_coeffs(self, coeffs: Dict[str, float]) -> Dict[str, float]:
        """Map identified coefficients to their canonical representative when
        the PDE determines a parameter only up to a symmetry (e.g.
        Black-Scholes sigma enters the residual solely as sigma^2, so +/-
        sigma are equally valid minimizers). Identity by default."""
        return dict(coeffs)

    @property
    def true_parameters(self) -> Dict[str, float]:
        return dict(self._true_parameters)

    def get_trainable_parameter_values(self, coeffs: Coeffs) -> Dict[str, float]:
        return {k: float(v) for k, v in coeffs.items()}

    def _validate_parameters(self) -> None:
        """Subclasses check required coefficients here."""

    # ------------------------------------------------------------------ #
    # Physics (abstract)
    # ------------------------------------------------------------------ #

    def residual_pointwise(self, u: PointFn, z: jax.Array, coeffs: Optional[Coeffs]) -> jax.Array:
        raise NotImplementedError

    # Number of coupled output channels the residual constrains. 1 = the
    # direct formulation (a scalar u and a single residual). Subclasses that
    # support an auxiliary first-order formulation (u plus its derivative
    # chain as extra network outputs, tied by compatibility residuals) set
    # this >1 in __init__ and implement ``residual_pointwise_system``.
    system_size: int = 1

    def residual_pointwise_system(
        self, uvec: PointFn, z: jax.Array, coeffs: Optional[Coeffs]
    ) -> jax.Array:
        """Point-wise residual VECTOR for the auxiliary first-order system.

        ``uvec: (dim+1,) -> (system_size,)`` is the full network restriction;
        returns ``(system_size,)`` of (dynamics + compatibility) residuals.
        High-order PDEs (KdV's u_xxx, Cahn-Hilliard's biharmonic) expose a
        badly-conditioned loss landscape through nested differentiation; the
        auxiliary form needs only FIRST-order jvps of the network, trading a
        wider output head for a much better-conditioned optimization problem
        (cf. Gladstone et al., "FO-PINNs", arXiv:2210.14320).
        """
        raise NotImplementedError

    def exact_solution(self, x: jax.Array, t: jax.Array, coeffs: Optional[Coeffs] = None):
        """Batched exact solution u(x, t); None when unavailable."""
        return None

    # Derivative orders the residual needs; used by trainer diagnostics.
    spatial_orders: Tuple[int, ...] = (1, 2)
    temporal_orders: Tuple[int, ...] = (1,)

    # True when ``residual_pointwise`` accesses the network ONLY through
    # ``u(z)`` / ``directional_derivative`` / ``laplacian`` — the contract
    # the stacked-jet BundleView satisfies (ops/jet_mlp.py). Subclasses
    # that differentiate composed functions (Cahn-Hilliard's chemical
    # potential) must set this False.
    bundle_compatible: bool = True

    def attach_fast_bundle(self, model, enable: str | bool = "auto") -> bool:
        """Attach the stacked-jet residual fast path for ``model``.

        ``enable``: True / False / "auto" (attach when the architecture is
        supported and the residual is bundle-compatible). Returns whether
        the fast path is active. Called by the trainer and benchmarks once
        the model exists; the PDE alone only sees ``apply_fn``.
        """
        from pinnrl_tpu.ops import jet_mlp

        if enable in (False, "off", "false"):
            self._fast_bundle_fn = None
            return False
        if enable == "on":
            enable = True
        ok = (
            self.bundle_compatible
            and self.system_size == 1
            and jet_mlp.supports(model)
        )
        if not ok:
            if enable is True:
                raise ValueError(
                    "stacked_jet=true but the PDE/model pair does not support "
                    f"the fast bundle path (pde={self.pde_type}, "
                    f"arch={model.config.architecture})"
                )
            self._fast_bundle_fn = None
            return False
        self._fast_bundle_fn = jet_mlp.make_bundle_fn(
            model,
            self.dimension,
            spatial_order=max(self.spatial_orders, default=0),
            temporal_order=max(self.temporal_orders, default=0),
        )
        return True

    def attach_fused_residual_kernel(self, model, enable: str | bool = "auto") -> bool:
        """Attach the fused forward+backward Pallas residual-loss kernel
        (ops/kernels/fused_step.py): one VMEM-resident program computes the
        mean-square residual AND its parameter gradient per batch tile, so
        the stacked-stream activations never round-trip HBM between forward
        and backward. TPU backend only; ``compute_loss`` falls back to the
        XLA path off-TPU, for non-f32 params (the f64 polish phase), or for
        batches not divisible by 8."""
        import jax as _jax

        from pinnrl_tpu.ops.kernels import fused_step

        if enable in (False, "off", "false"):
            self._fused_residual_loss = None
            return False
        ok = (
            _jax.default_backend() in ("tpu", "axon")
            and fused_step.supports(model, self, self.training)
        )
        if not ok:
            if enable is True or enable == "on":
                raise ValueError(
                    "fused residual kernel requested but unsupported for "
                    f"pde={self.pde_type}, arch={model.config.architecture}, "
                    f"backend={_jax.default_backend()}"
                )
            self._fused_residual_loss = None
            return False
        eps = (
            float(getattr(self.training, "causal_eps", 0.0) or 0.0)
            if self.training is not None else 0.0
        )
        self._fused_causal = eps > 0.0
        self._fused_residual_loss = fused_step.make_fused_residual_loss(
            model, self, causal_eps=eps
        )
        return True

    def _scalar_u(self, apply_fn: Callable, params) -> PointFn:
        """Point-wise scalar restriction of the network (channel 0)."""

        def u(z: jax.Array) -> jax.Array:
            out = apply_fn(params, z)
            return jnp.reshape(out, (-1,))[0]

        return u

    def compute_residual(
        self,
        apply_fn: Callable,
        params,
        x: jax.Array,
        t: jax.Array,
        coeffs: Optional[Coeffs] = None,
    ) -> jax.Array:
        """Batched residual: vmap of the point-wise residual. (N, 1) in the
        direct formulation, (N, system_size) for auxiliary systems."""
        z = jnp.concatenate([x, t], axis=-1)
        if self.system_size > 1:
            k = self.system_size

            def uvec(zz: jax.Array) -> jax.Array:
                return jnp.reshape(apply_fn(params, zz), (-1,))[:k]

            r = jax.vmap(lambda zz: self.residual_pointwise_system(uvec, zz, coeffs))(z)
            return r.reshape(-1, k)
        if self._fast_bundle_fn is not None:
            # Stacked-jet fast path: the network + all derivative streams
            # are evaluated once for the whole batch (one matmul per layer);
            # only the cheap residual arithmetic is vmapped, against a
            # BundleView that serves the precomputed streams.
            from pinnrl_tpu.ops.jet_mlp import BundleView

            value, streams = self._fast_bundle_fn(params, z)

            def point_res(val, st, zz):
                return self.residual_pointwise(BundleView(val, st), zz, coeffs)

            r = jax.vmap(point_res)(value, streams, z)
            return r.reshape(-1, 1)
        u = self._scalar_u(apply_fn, params)
        r = jax.vmap(lambda zz: self.residual_pointwise(u, zz, coeffs))(z)
        return r.reshape(-1, 1)

    def residual_score(
        self,
        apply_fn: Callable,
        params,
        x: jax.Array,
        t: jax.Array,
        coeffs: Optional[Coeffs] = None,
    ) -> jax.Array:
        """Per-POINT scalar residual magnitude, shape (N,).

        RAR pool scoring and the RL reward need one score per collocation
        point; in the auxiliary-system formulation ``compute_residual`` is
        (N, system_size), so the channels are l2-collapsed here rather than
        letting callers ``reshape(-1)`` a matrix into 3N bogus scores."""
        r = self.compute_residual(apply_fn, params, x, t, coeffs)
        if r.ndim == 2 and r.shape[1] > 1:
            return jnp.sqrt(jnp.sum(r * r, axis=1))
        return jnp.abs(r.reshape(-1))

    def compute_derivatives(
        self,
        apply_fn: Callable,
        params,
        x: jax.Array,
        t: jax.Array,
        spatial_derivatives=(1, 2),
        temporal_derivatives=(1,),
    ) -> Dict[str, jax.Array]:
        """Reference-compatible derivative bundle (reference: pde_base.py:590-794)."""
        u = self._scalar_u(apply_fn, params)
        z = jnp.concatenate([x, t], axis=-1)
        bundle = jax.vmap(
            lambda zz: derivative_bundle(
                u,
                zz,
                dimension=self.dimension,
                spatial_orders=tuple(spatial_derivatives),
                temporal_orders=tuple(temporal_derivatives),
            )
        )(z)
        return {k: v.reshape(-1, 1) for k, v in bundle.items()}

    # ------------------------------------------------------------------ #
    # BC / IC targets
    # ------------------------------------------------------------------ #

    def _create_boundary_condition(self, bc_type: str, params: Dict[str, Any]) -> Callable:
        """BC/IC type string -> jnp target closure (reference: pde_base.py:492-575)."""
        if bc_type in ("left", "right"):
            bc_type = "dirichlet"

        if bc_type == "dirichlet":
            if params.get("type") == "exact":
                # Exact-solution-aware Dirichlet target (the reference's heat
                # subclass builds BCs from the exact solution,
                # heat_equation.py:214-294; here it is a generic type so any
                # PDE with an exact solution can avoid the value-0 proxy —
                # e.g. the KdV soliton tail reaches ~9e-5 at x=+15 by t=5 and
                # pinning it to 0 seeds a dispersive error wave that
                # dominates the whole-domain error).
                if not self.settings.exact_solution:
                    raise ValueError(
                        f"{self.pde_type}: boundary type 'exact' requires an "
                        "exact_solution config block"
                    )
                return lambda x, t: self.exact_solution(x, t)
            value = float(params.get("value", 0.0) or 0.0)
            return lambda x, t: jnp.full_like(x[:, 0:1], value)

        if bc_type == "neumann":
            # Target for the OUTWARD NORMAL DERIVATIVE at the boundary; the
            # derivative itself is computed structurally in ``_neumann_loss``.
            value = float(params.get("value", 0.0) or 0.0)
            return lambda x, t: jnp.full_like(x[:, 0:1], value)

        if bc_type == "periodic":
            # Periodicity is enforced structurally (opposite-face value and
            # derivative matching in ``_periodic_loss``), not against a target
            # function; the closure is a placeholder kept so the registered
            # BC dict has an entry per configured type.
            return lambda x, t: jnp.zeros_like(x[:, 0:1])

        if bc_type == "initial":
            return self._create_initial_condition(params)

        # Unsupported -> zero target (reference warns and defaults to zero).
        return lambda x, t: jnp.zeros_like(x[:, 0:1])

    def _create_initial_condition(self, params: Dict[str, Any]) -> Callable:
        ic_type = params.get("type", "sine")

        if ic_type == "exact":
            if not self.settings.exact_solution:
                raise ValueError(
                    f"{self.pde_type}: initial type 'exact' requires an "
                    "exact_solution config block"
                )
            return lambda x, t: self.exact_solution(x, t)

        if ic_type in ("sine", "sin", "sin_exp_decay"):
            A = float(params.get("amplitude", 1.0))
            k = float(params.get("frequency", 1.0))
            return lambda x, t: A * jnp.sin(k * jnp.pi * x[:, 0:1])

        if ic_type == "tanh":
            eps = float(params.get("epsilon", 0.1))
            return lambda x, t: jnp.tanh(x[:, 0:1] / eps)

        if ic_type == "gaussian":
            mean = float(params.get("mean", params.get("center", 0.0)))
            std = float(params.get("std", params.get("sigma", 0.1)))
            A = float(params.get("amplitude", 1.0))
            return lambda x, t: A * jnp.exp(-((x[:, 0:1] - mean) ** 2) / (2 * std**2))

        if ic_type == "fixed":
            value = float(params.get("value", 0.0))
            return lambda x, t: jnp.full_like(x[:, 0:1], value)

        if ic_type == "random":
            # Deterministic random field as a FUNCTION OF COORDINATES: a fixed
            # random Fourier series drawn once from the seed, so the target
            # does not change with the evaluation point set (the reference's
            # torch.rand_like draws fresh noise per call —
            # reference: pde_base.py:538-545 — which is not a well-defined
            # target function; this is the jit-pure fix).
            amplitude = float(params.get("amplitude", 0.1))
            seed = int(params.get("seed", 0))
            n_modes = int(params.get("n_modes", 16))
            k_w, k_p, k_a = jax.random.split(jax.random.PRNGKey(seed), 3)
            W = jax.random.normal(k_w, (self.dimension, n_modes)) * 4.0
            phase = jax.random.uniform(k_p, (n_modes,), maxval=2 * jnp.pi)
            amp = jax.random.normal(k_a, (n_modes,)) / jnp.sqrt(n_modes)

            def random_ic(x, t):
                feats = jnp.sin(x[:, : self.dimension] @ W + phase)
                return amplitude * (feats @ amp).reshape(-1, 1)

            return random_ic

        if ic_type == "small_angle":
            theta0 = float(params.get("initial_angle", 0.5))
            return lambda x, t: jnp.full_like(x[:, 0:1], theta0)

        if ic_type == "option":
            strike = float(params.get("strike", params.get("strike_price", 100.0)))
            option_type = params.get("option_type", "call")
            if option_type == "call":
                return lambda x, t: jnp.maximum(x[:, 0:1] - strike, 0.0)
            return lambda x, t: jnp.maximum(strike - x[:, 0:1], 0.0)

        return lambda x, t: jnp.zeros_like(x[:, 0:1])

    # ------------------------------------------------------------------ #
    # Sampling
    # ------------------------------------------------------------------ #

    def generate_collocation_points(
        self,
        key: jax.Array,
        num_points: int,
        strategy: str = "uniform",
        residual_fn: Optional[Callable] = None,
        score_fn: Optional[Callable] = None,
        **kwargs,
    ) -> Tuple[jax.Array, jax.Array]:
        """Strategy dispatcher (reference: pde_base.py:937-1084).

        Extra ``kwargs`` are forwarded to the strategy (RAR accepts
        ``pool_factor`` / ``uniform_floor`` / ``power`` — the RAD
        hyper-parameters)."""
        if strategy == "uniform":
            return sample_uniform(key, num_points, self.domain, self.time_domain)
        if strategy == "stratified":
            return sample_stratified(key, num_points, self.domain, self.time_domain)
        if strategy == "residual_based":
            return sample_residual_based(
                key,
                num_points,
                self.domain,
                self.time_domain,
                residual_fn=residual_fn,
                **kwargs,
            )
        if strategy == "adaptive":
            return sample_adaptive(
                key, num_points, self.domain, self.time_domain, score_fn=score_fn
            )
        raise ValueError(f"Unknown sampling strategy {strategy!r}")

    # ------------------------------------------------------------------ #
    # Observations (inverse / data modes)
    # ------------------------------------------------------------------ #

    def _load_observation_data(self, spec: Any) -> None:
        """Accepts an .npz path, dict of arrays, tuple, or a Well dataset spec
        (reference: pde_base.py:359-420)."""
        if isinstance(spec, dict) and spec.get("source") == "well":
            from pinnrl_tpu.datasets import load_well_slice

            arrs = load_well_slice(**{k: v for k, v in spec.items() if k != "source"})
            self.set_observations(arrs["x"], arrs["t"], arrs["u"])
            return
        if isinstance(spec, str):
            with np.load(spec) as data:
                self.set_observations(data["x"], data["t"], data["u"])
            return
        if isinstance(spec, dict):
            self.set_observations(spec["x"], spec["t"], spec["u"])
            return
        if isinstance(spec, (tuple, list)) and len(spec) == 3:
            self.set_observations(*spec)
            return
        raise ValueError(f"Unsupported observation_data spec: {type(spec)}")

    def set_observations(self, x, t, u) -> None:
        x = jnp.asarray(x, jnp.float32).reshape(-1, self.dimension)
        t = jnp.asarray(t, jnp.float32).reshape(-1, 1)
        u = jnp.asarray(u, jnp.float32)
        u = u.reshape(x.shape[0], -1)
        self.observations = (x, t, u)

    def generate_synthetic_observations(
        self, key: jax.Array, num_points: int = 200, noise: float = 0.0
    ) -> None:
        """Sample the exact solution at the TRUE parameter values and add
        Gaussian noise (reference: pde_base.py:422-472 — the trainable dict is
        hidden so targets don't encode the initial guess; here exact_solution
        with ``coeffs=None`` reads the true static values by construction)."""
        k_pts, k_noise = jax.random.split(key)
        x, t = sample_uniform(k_pts, num_points, self.domain, self.time_domain)
        u = self.exact_solution(x, t, coeffs=None)
        if u is None:
            raise ValueError(f"{self.pde_type}: no exact solution to synthesize observations from")
        if noise > 0:
            u = u + noise * jax.random.normal(k_noise, u.shape)
        self.set_observations(x, t, u)

    def hard_ic_transform(self) -> Callable:
        """Output transform imposing the initial condition EXACTLY:

            u(x, t) = u0(x) [+ (t - t0) * v0(x)]  +  ramp(t) * net(x, t)

        with ramp = tanh(tau) for 1st-order-in-time PDEs and tanh(tau)^2
        (zero value AND slope at t0) for 2nd-order ones, tau = (t-t0)/T.
        The velocity target v0 is d/dt of the exact solution at t0 when one
        is configured, else 0. Standard hard-constraint formulation (Lagaris
        et al.); the soft IC losses become trivially ~0 and the optimizer
        spends its entire budget on the residual. Scalar (output_dim == 1)
        PDEs only.

        Wired by PDETrainer when ``model.hard_ic`` is true; composes at the
        PINNModel.apply choke point so residual derivatives flow through it.
        """
        ic_fn = self.boundary_conditions.get("initial")
        if ic_fn is None:
            raise ValueError(f"{self.pde_type}: hard_ic requires an initial condition")
        if int(self.settings.output_dim or 1) != 1:
            raise ValueError("hard_ic supports scalar (output_dim == 1) PDEs only")
        t0 = float(self.time_domain[0])
        horizon = float(self.time_domain[1]) - t0
        # Ramp timescale. The FULL horizon is a bad default for long
        # horizons: tanh((t-t0)/T)^2 has curvature ~2/T^2 at t0, so with
        # T = 10 the net must output O(T^2) values to supply u_tt near the
        # initial time (measured: pendulum hard-IC train loss stuck at 1e-2,
        # rel-L2 2.5e-2). model.arch-independent `hard_ic_timescale` (in time
        # units) overrides; default caps at 1.
        timescale = float(
            getattr(self.settings, "hard_ic_timescale", None)
            or self.parameters.get("hard_ic_timescale")
            or min(horizon, 1.0)
        )
        second_order = 2 in tuple(getattr(self, "temporal_orders", (1,)))
        has_exact = bool(self.settings.exact_solution)

        def transform(z: jax.Array, out: jax.Array) -> jax.Array:
            flat = z.reshape(-1, z.shape[-1])
            x, t = flat[:, :-1], flat[:, -1:]
            tt0 = jnp.full_like(t, t0)
            u0 = ic_fn(x, tt0)
            tau = (t - t0) / timescale
            if second_order:
                ramp = jnp.tanh(tau) ** 2
                if has_exact:
                    v0 = jax.jvp(
                        lambda s: self.exact_solution(x, s),
                        (tt0,), (jnp.ones_like(tt0),),
                    )[1]
                else:
                    v0 = jnp.zeros_like(u0)
                base = u0 + (t - t0) * v0
            else:
                ramp = jnp.tanh(tau)
                base = u0
            res = base + ramp * out.reshape(flat.shape[0], -1)
            return res.reshape(out.shape)

        return transform

    def _compute_data_loss(self, apply_fn: Callable, params) -> jax.Array:
        """Observation misfit (reference: pde_base.py:281-291)."""
        if self.observations is None:
            return jnp.zeros(())
        x_obs, t_obs, u_obs = self.observations
        pred = apply_fn(params, jnp.concatenate([x_obs, t_obs], axis=-1))
        pred = pred.reshape(u_obs.shape[0], -1)
        return self._loss(pred - u_obs)

    # ------------------------------------------------------------------ #
    # Loss assembly
    # ------------------------------------------------------------------ #

    def _loss(self, diff: jax.Array) -> jax.Array:
        lf, delta = "mse", 1.0
        if self.training is not None:
            lf = getattr(self.training, "loss_function", "mse")
            delta = float(getattr(self.training, "huber_delta", 1.0))
        return apply_loss_fn(diff, lf, delta)

    def _residual_loss(self, residual: jax.Array, t: jax.Array) -> jax.Array:
        """Residual reduction, optionally causally weighted.

        With ``training.causal_eps > 0`` residuals are sorted by time and
        weighted ``w_i = exp(-eps * sum_{t_j < t_i} r_j^2 / N)`` (weights
        stop-gradiented), so late-time residuals only matter once early-time
        physics is satisfied — the front-to-back training of Wang et al.
        Time-horizon error amplification (e.g. KdV over t in [0,5]) is the
        failure mode this addresses.
        """
        eps = float(getattr(self.training, "causal_eps", 0.0) or 0.0) if self.training else 0.0
        if eps <= 0.0:
            return self._loss(residual)
        if residual.ndim == 2 and residual.shape[1] > 1:
            # Auxiliary system: one causal weight per POINT, summed over the
            # coupled residual components.
            r2 = jnp.sum(residual**2, axis=1)
        else:
            r2 = residual.reshape(-1) ** 2
        order = jnp.argsort(t.reshape(-1))
        r2_sorted = r2[order]
        n = r2_sorted.shape[0]
        cum_prev = jnp.cumsum(r2_sorted) - r2_sorted
        w = jax.lax.stop_gradient(jnp.exp(-eps * cum_prev / n))
        return jnp.sum(w * r2_sorted) / jnp.maximum(jnp.sum(w), 1e-12)

    def _training_mode(self) -> str:
        return getattr(self.training, "mode", "forward") if self.training else "forward"

    def _loss_weights(self) -> Dict[str, float]:
        lw = {}
        if self.training is not None:
            lw = dict(getattr(self.training, "loss_weights", {}) or {})
        return lw

    # ------------------------------------------------------------------ #
    # Fresh keyed BC/IC point sampling (per-step resampling; the reference
    # re-creates the same deterministic linspace every step,
    # pde_base.py:1100-1140 — fresh PRNG points avoid the net memorizing a
    # fixed boundary set and drifting between its points)
    # ------------------------------------------------------------------ #

    def _bc_counts(self, n_colloc: int) -> Tuple[int, int]:
        """(num_boundary_points, num_initial_points) honoring the config
        exactly (no silent floors); sized from the collocation batch when
        unconfigured."""
        n_b = n_i = 0
        if self.training is not None:
            n_b = int(getattr(self.training, "num_boundary_points", 0) or 0)
            n_i = int(getattr(self.training, "num_initial_points", 0) or 0)
        if n_b <= 0:
            n_b = max(n_colloc // 10, 16)
        if n_i <= 0:
            n_i = max(n_colloc // 5, 16)
        return n_b, n_i

    def _space_bounds(self):
        los = jnp.array([lo for lo, _ in self.domain], jnp.float32)
        his = jnp.array([hi for _, hi in self.domain], jnp.float32)
        return los, his

    def _sample_boundary_time(self, key: jax.Array, n: int) -> jax.Array:
        """Boundary time coordinates; uniform by default (heat overrides with
        an early-time-stratified draw)."""
        lo, hi = self.time_domain
        return jax.random.uniform(key, (n, 1), minval=lo, maxval=hi)

    def _sample_face(self, key: jax.Array, n: int, axis: int, face_val: float) -> jax.Array:
        """n fresh points on one domain face: pinned coordinate at the face
        value, free coordinates uniform over their ranges."""
        los, his = self._space_bounds()
        x = jax.random.uniform(key, (n, self.dimension), minval=los, maxval=his)
        return x.at[:, axis].set(face_val)

    def _sample_boundary_points(self, key: jax.Array, n: int):
        """Fresh boundary points covering every face of the box, ``n`` split
        evenly across the ``2*dim`` faces."""
        per_face = max(n // (2 * self.dimension), 1)
        xs, ts = [], []
        for axis in range(self.dimension):
            for face_val in self.domain[axis]:
                key, k_x, k_t = jax.random.split(key, 3)
                xs.append(self._sample_face(k_x, per_face, axis, face_val))
                ts.append(self._sample_boundary_time(k_t, per_face))
        return jnp.concatenate(xs, axis=0), jnp.concatenate(ts, axis=0)

    def _sample_initial_points(self, key: jax.Array, n: int):
        """Fresh spatial points at the initial time, uniform over the domain.

        Anchored at ``time_domain[0]`` (not literal t=0) so problems posed on
        a shifted window — e.g. time-marching training, where window k
        inherits its IC from window k-1's model — enforce the IC at the
        window start."""
        los, his = self._space_bounds()
        x = jax.random.uniform(key, (n, self.dimension), minval=los, maxval=his)
        return x, jnp.full((n, 1), self.time_domain[0], jnp.float32)

    # ------------------------------------------------------------------ #
    # Structural BC losses
    # ------------------------------------------------------------------ #

    def _periodic_loss(self, u_scalar: PointFn, key: jax.Array, n: int) -> jax.Array:
        """True periodicity: opposite-face VALUE and first-DERIVATIVE matching
        per axis (the reference's heat override does this in 1D,
        heat_equation.py:420-445; the generic base gets the same treatment so
        KdV/Burgers/convection with periodic configs train against actual
        periodicity, not a proxy target)."""
        from pinnrl_tpu.ops.derivatives import directional_derivative

        per_axis = max(n // (2 * self.dimension), 1)
        los, his = self._space_bounds()
        loss = jnp.zeros(())
        for axis in range(self.dimension):
            key, k_free, k_t = jax.random.split(key, 3)
            free = jax.random.uniform(
                k_free, (per_axis, self.dimension), minval=los, maxval=his
            )
            t_ax = self._sample_boundary_time(k_t, per_axis)
            lo_ax, hi_ax = self.domain[axis]
            z_lo = jnp.concatenate([free.at[:, axis].set(lo_ax), t_ax], axis=1)
            z_hi = jnp.concatenate([free.at[:, axis].set(hi_ax), t_ax], axis=1)
            u_lo = jax.vmap(u_scalar)(z_lo)
            u_hi = jax.vmap(u_scalar)(z_hi)
            loss = loss + self._loss(u_lo - u_hi)
            du = lambda zz, _ax=axis: directional_derivative(u_scalar, zz, _ax, 1)[0]
            loss = loss + self._loss(jax.vmap(du)(z_lo) - jax.vmap(du)(z_hi))
        return loss

    def _neumann_loss(
        self, u_scalar: PointFn, bc_func: Callable, key: jax.Array, n: int
    ) -> jax.Array:
        """Neumann BC: OUTWARD NORMAL derivative matched to the target (the
        reference value-matches instead — pde_base.py:510-517; a Neumann
        condition constrains du/dn, so that is what enters the loss)."""
        from pinnrl_tpu.ops.derivatives import directional_derivative

        per_face = max(n // (2 * self.dimension), 1)
        loss = jnp.zeros(())
        for axis in range(self.dimension):
            for i, face_val in enumerate(self.domain[axis]):
                key, k_x, k_t = jax.random.split(key, 3)
                x_f = self._sample_face(k_x, per_face, axis, face_val)
                t_f = self._sample_boundary_time(k_t, per_face)
                z = jnp.concatenate([x_f, t_f], axis=1)
                sign = -1.0 if i == 0 else 1.0  # outward normal direction
                du = jax.vmap(
                    lambda zz, _ax=axis: directional_derivative(u_scalar, zz, _ax, 1)[0]
                )(z).reshape(-1, 1)
                loss = loss + self._loss(sign * du - bc_func(x_f, t_f))
        return loss

    def _boundary_loss(
        self, apply_fn: Callable, params, key: jax.Array, n_b: int
    ) -> jax.Array:
        """Assemble all registered (non-initial) boundary conditions on fresh
        keyed points, dispatching periodic/Neumann to their structural forms."""
        u_scalar = self._scalar_u(apply_fn, params)
        loss = jnp.zeros(())
        for bc_type, bc_func in self.boundary_conditions.items():
            if bc_type == "initial":
                continue
            key, k_bc = jax.random.split(key)
            if bc_type == "periodic":
                loss = loss + self._periodic_loss(u_scalar, k_bc, n_b)
            elif bc_type == "neumann":
                loss = loss + self._neumann_loss(u_scalar, bc_func, k_bc, n_b)
            else:
                x_b, t_b = self._sample_boundary_points(k_bc, n_b)
                u_b = apply_fn(params, jnp.concatenate([x_b, t_b], axis=-1)).reshape(
                    x_b.shape[0], -1
                )[:, 0:1]
                loss = loss + self._loss(u_b - bc_func(x_b, t_b))
        return loss

    def _fd_smoothness(self, apply_fn: Callable, params, x: jax.Array, t: jax.Array):
        """Finite-difference gradient-magnitude regularizer, assembled
        generically for every PDE (reference computes it only in the heat
        override, heat_equation.py:625-650, and stubs the generic path)."""
        eps = 1e-4
        u_fn = lambda xx: apply_fn(params, jnp.concatenate([xx, t], axis=-1)).reshape(
            xx.shape[0], -1
        )[:, 0:1]
        u_c = u_fn(x)
        loss = jnp.zeros(())
        for d in range(self.dimension):
            lo, hi = self.domain[d]
            x_p = x.at[:, d].set(jnp.clip(x[:, d] + eps, lo, hi))
            x_m = x.at[:, d].set(jnp.clip(x[:, d] - eps, lo, hi))
            du_f = (u_fn(x_p) - u_c) / eps
            du_b = (u_c - u_fn(x_m)) / eps
            loss = loss + jnp.mean(jnp.abs(du_f)) + jnp.mean(jnp.abs(du_b))
        return loss

    def _boundary_skeleton(self, n_time: int = 100):
        """Static boundary evaluation points: every domain face x a time
        linspace (reference: pde_base.py:1100-1125). Precomputed with numpy so
        it folds to constants under jit.

        DEPRECATED in the loss path (fresh keyed sampling replaced it); kept
        for validation grids and tests.

        N-D: for each axis and each face, the pinned coordinate sits on the
        face while the free spatial coordinates sweep a linspace (so every
        face of the box is actually enforced)."""
        blocks_x, blocks_t = [], []
        rng = np.random.default_rng(0)  # fixed seed: static jit constants
        for axis in range(self.dimension):
            for face_val in self.domain[axis]:
                block = np.empty((n_time, self.dimension), np.float32)
                for d in range(self.dimension):
                    if d == axis:
                        block[:, d] = face_val
                    elif self.dimension == 1:
                        block[:, d] = face_val
                    else:
                        lo, hi = self.domain[d]
                        # Random sweep so (free coords x time) covers the whole
                        # face, not just its diagonal.
                        block[:, d] = rng.uniform(lo, hi, n_time)
                blocks_x.append(block)
                if self.dimension == 1:
                    t_face = np.linspace(
                        self.time_domain[0], self.time_domain[1], n_time
                    )
                else:
                    t_face = rng.uniform(
                        self.time_domain[0], self.time_domain[1], n_time
                    )
                blocks_t.append(t_face.astype(np.float32).reshape(-1, 1))
        x_b = np.concatenate(blocks_x, axis=0)
        t_b = np.concatenate(blocks_t, axis=0)
        return jnp.asarray(x_b), jnp.asarray(t_b)

    def _initial_skeleton(self, n: int = 100):
        x_line = np.linspace(self.domain[0][0], self.domain[0][1], n, dtype=np.float32)
        if self.dimension == 1:
            x_i = x_line.reshape(-1, 1)
        else:
            axes = [
                np.linspace(lo, hi, max(2, int(round(n ** (1 / self.dimension)))))
                for lo, hi in self.domain
            ]
            mesh = np.meshgrid(*axes, indexing="ij")
            x_i = np.stack([m.reshape(-1) for m in mesh], axis=-1).astype(np.float32)
        t_i = np.zeros((x_i.shape[0], 1), np.float32)
        return jnp.asarray(x_i), jnp.asarray(t_i)

    def compute_loss(
        self,
        apply_fn: Callable,
        params,
        x: jax.Array,
        t: jax.Array,
        coeffs: Optional[Coeffs] = None,
        key: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """Assemble all loss components (reference: pde_base.py:1086-1235).

        Fully jittable: BC/IC evaluation points are sampled fresh from the
        PRNG ``key`` every call (static shapes from the configured counts),
        so a multi-epoch run never trains against a memorized point set.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        k_b, k_i = jax.random.split(jax.random.fold_in(key, 0xB0), 2)
        use_fused = (
            self._fused_residual_loss is not None
            and not coeffs  # explicit coefficient overrides take the XLA path
            and x.dtype == jnp.float32
            and x.shape[0] % 8 == 0
            and all(
                l.dtype == jnp.float32
                for l in jax.tree_util.tree_leaves(params)
            )
        )
        if use_fused:
            # Fused fwd+bwd Pallas kernel: (causally-weighted) mean(r^2) +
            # its parameter gradient in one VMEM-resident program (attach
            # gate already excluded non-mse / trainable coeffs). The causal
            # variant requires time-sorted points: the argsort+gather runs
            # in XLA here, the exact prefix weighting inside the kernel.
            z = jnp.concatenate([x, t], axis=-1)
            if getattr(self, "_fused_causal", False):
                z = z[jnp.argsort(t.reshape(-1))]
            residual_loss = self._fused_residual_loss(params, z)
        else:
            residual = self.compute_residual(apply_fn, params, x, t, coeffs)
            residual_loss = self._residual_loss(residual, t)

        n_b, n_i = self._bc_counts(x.shape[0])
        boundary_loss = self._boundary_loss(apply_fn, params, k_b, n_b)

        x_i, t_i = self._sample_initial_points(k_i, n_i)
        u_initial = apply_fn(params, jnp.concatenate([x_i, t_i], axis=-1)).reshape(
            x_i.shape[0], -1
        )[:, 0:1]
        ic_fn = self.boundary_conditions.get("initial")
        u_target_i = ic_fn(x_i, t_i) if ic_fn is not None else jnp.zeros_like(u_initial)
        initial_loss = self._loss(u_initial - u_target_i)

        data_loss = self._compute_data_loss(apply_fn, params)
        smoothness_loss = jnp.zeros(())
        if float(self._loss_weights().get("smoothness", 0.0)) > 0:
            smoothness_loss = self._fd_smoothness(apply_fn, params, x, t)
        gpinn_loss = jnp.zeros(())
        if float(self._loss_weights().get("gpinn", 0.0)) > 0:
            gpinn_loss = self._gpinn_loss(apply_fn, params, x, t, coeffs)

        return self._assemble_total(
            residual_loss, boundary_loss, initial_loss, smoothness_loss, data_loss,
            gpinn_loss,
        )

    def _gpinn_loss(
        self,
        apply_fn: Callable,
        params,
        x: jax.Array,
        t: jax.Array,
        coeffs: Optional[Coeffs] = None,
    ) -> jax.Array:
        """Gradient-enhanced residual penalty (gPINN, Yu et al. 2022):
        mean |grad_z r(z)|^2 over the collocation batch. The exact solution
        has an identically-zero residual FIELD, so its gradient vanishes
        too; penalizing grad r forces the learned residual toward flat-zero
        instead of oscillating around zero — the oscillation is exactly the
        radiated far-field error that dispersive problems (KdV) amplify over
        the time horizon. One jacfwd over the point-wise residual: +dim+1
        forward passes at one-higher derivative order (KdV: order 4, within
        the engine's jet support). Enable with loss_weights.gpinn > 0
        (typical 1e-2..1e-1 relative to the residual weight)."""
        z = jnp.concatenate([x, t], axis=-1)
        if self.system_size > 1:
            k = self.system_size

            def uvec(zz: jax.Array) -> jax.Array:
                return jnp.reshape(apply_fn(params, zz), (-1,))[:k]

            def r_point(zz):
                return self.residual_pointwise_system(uvec, zz, coeffs)

        else:
            u = self._scalar_u(apply_fn, params)

            def r_point(zz):
                return self.residual_pointwise(u, zz, coeffs)

        g = jax.vmap(jax.jacfwd(r_point))(z)
        return jnp.mean(jnp.sum(jnp.reshape(g, (g.shape[0], -1)) ** 2, axis=-1))

    def _assemble_total(
        self, residual_loss, boundary_loss, initial_loss, smoothness_loss, data_loss,
        gpinn_loss=None,
    ) -> Dict[str, jax.Array]:
        """Mode gating + fixed/adaptive weighting (reference: pde_base.py:1189-1235)."""
        if gpinn_loss is None:
            gpinn_loss = jnp.zeros(())
        lw = self._loss_weights()
        smoothness_weight = float(lw.get("smoothness", 0.0))
        gpinn_weight = float(lw.get("gpinn", 0.0))
        data_weight = float(lw.get("data", 1.0))
        mode = self._training_mode()
        residual_active = 0.0 if mode == "data_only" else 1.0
        ic_bc_active = residual_active
        if mode in ("inverse", "data_only", "data_augmented") and data_weight <= 0.0:
            data_weight = 1.0

        losses = {
            "residual": residual_loss,
            "boundary": boundary_loss,
            "initial": initial_loss,
            "smoothness": smoothness_loss,
            "data": data_loss,
            "gpinn": gpinn_loss,
        }

        aw_enabled = bool(
            self.training is not None
            and getattr(self.training, "adaptive_weights", None) is not None
            and self.training.adaptive_weights.enabled
        )
        if aw_enabled:
            # Adaptive weighting is applied by the trainer; total is unweighted.
            losses["total"] = (
                residual_active * residual_loss
                + ic_bc_active * boundary_loss
                + ic_bc_active * initial_loss
                + smoothness_weight * smoothness_loss
                + residual_active * gpinn_weight * gpinn_loss
                + data_weight * data_loss
            )
        else:
            w_res = float(lw.get("pde", lw.get("residual", 1.0)))
            w_bc = float(lw.get("boundary", 10.0))
            w_ic = float(lw.get("initial", 10.0))
            losses["total"] = (
                residual_active * w_res * residual_loss
                + ic_bc_active * w_bc * boundary_loss
                + ic_bc_active * w_ic * initial_loss
                + smoothness_weight * smoothness_loss
                + residual_active * gpinn_weight * gpinn_loss
                + data_weight * data_loss
            )
        return losses

    # ------------------------------------------------------------------ #
    # State persistence (reference: pde_base.py:1335-1362)
    # ------------------------------------------------------------------ #

    def save_state(self, path) -> None:
        """Persist settings + collocation history (JSON+NPZ, no pickle)."""
        import json
        from dataclasses import asdict
        from pathlib import Path

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "pde_type": self.pde_type,
            "settings": asdict(self.settings),
            "true_parameters": self._true_parameters,
        }
        path.write_text(json.dumps(payload, default=str, indent=2))
        if self.collocation_history:
            np.savez(
                path.with_suffix(".history.npz"),
                *[np.asarray(h) for h in self.collocation_history],
            )

    @classmethod
    def load_state(cls, path, training: Optional[TrainingConfig] = None):
        import json
        from pathlib import Path

        payload = json.loads(Path(path).read_text())
        settings = PDESettings(**payload["settings"])
        pde = cls.create(payload["pde_type"], settings, training)
        hist_path = Path(path).with_suffix(".history.npz")
        if hist_path.exists():
            with np.load(hist_path) as data:
                pde.collocation_history = [data[k] for k in data.files]
        return pde

    # ------------------------------------------------------------------ #
    # Validation
    # ------------------------------------------------------------------ #

    def validate(
        self,
        apply_fn: Callable,
        params,
        coeffs: Optional[Coeffs] = None,
        key: Optional[jax.Array] = None,
        num_points: int = 1000,
    ) -> Dict[str, float]:
        """Error metrics vs the exact solution (reference: pde_base.py:1288-1304).

        NOTE: matching the reference, ``l2_error`` is mean SQUARED error.
        ``rel_l2`` (true relative L2 norm) is added for the north-star metric.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        x, t = sample_uniform(key, num_points, self.domain, self.time_domain)
        u_exact = self.exact_solution(x, t, coeffs)
        pred = apply_fn(params, jnp.concatenate([x, t], axis=-1)).reshape(x.shape[0], -1)[:, 0:1]
        if u_exact is None:
            return {"l2_error": float("nan"), "max_error": float("nan"), "mean_error": float("nan")}
        u_exact = u_exact.reshape(pred.shape)
        err = jnp.abs(pred - u_exact)
        rel = jnp.sqrt(jnp.sum((pred - u_exact) ** 2)) / (jnp.sqrt(jnp.sum(u_exact**2)) + 1e-12)
        return {
            "l2_error": float(jnp.mean(err**2)),
            "max_error": float(jnp.max(err)),
            "mean_error": float(jnp.mean(err)),
            "rel_l2": float(rel),
        }
