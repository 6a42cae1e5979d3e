"""LoRA fine-tuning (Hu et al. 2021, arXiv:2106.09685) — beyond parity.

The reference repo has no parameter-efficient fine-tuning; every stage
updates full module weights (train.py:400-419). Production users of SD-family
models fine-tune with LoRA constantly, so this framework ships it first-class:
low-rank factors A (in, r) and B (r, out) per adapted attention projection,
with the effective kernel W + (alpha/r) * A @ B.

TPU-first design: LoRA composes with the piecewise block-granular training
path (train/piecewise_grad.py) WITHOUT touching the per-block programs —
the merge `W + s*(A@B)` happens in one tiny jitted program before the chain,
and because the merge is affine in (A, B), the factor gradients are exact
projections of the dense kernel gradients the chain already produces:

    dL/dA = s * dL/dW @ B^T        dL/dB = s * A^T @ dL/dW

(`project_grads`; equivalence with direct autodiff through the merge is
verified in tests/test_lora.py). Frozen-base gradients never materialize:
the existing mask machinery prunes everything except the adapted kernels.

Checkpoints use the peft layout — `<torch key prefix>.lora_A.weight` (r, in),
`.lora_B.weight` (out, r) — so exported adapters line up with what the torch
ecosystem expects for these module names.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the four projections of every attention flavor (spatial attn1, reference
# attn1_5, audio attn2, temporal/motion) — ops/attention.py Dense names
DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out_0")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 8
    alpha: float = 8.0  # effective scale = alpha / rank (peft convention)
    targets: Tuple[str, ...] = DEFAULT_TARGETS
    # top-level pipeline modules to adapt (reference_net also works; the
    # frozen encoders make no sense to adapt)
    modules: Tuple[str, ...] = ("denoising_unet",)
    # optional regex over the slash-joined param path to narrow placement,
    # e.g. r"motion_modules" (temporal only) or r"attn2" (audio only)
    include: str = ""

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def _adapted(cfg: LoraConfig, path: Tuple[str, ...], leaf) -> bool:
    """Is params[...path] a kernel LoRA should adapt? path excludes the
    top-level module name and includes the trailing leaf name."""
    if len(path) < 2 or path[-1] != "kernel" or getattr(leaf, "ndim", 0) != 2:
        return False
    if path[-2] not in cfg.targets:
        return False
    if cfg.include and not re.search(cfg.include, "/".join(path)):
        return False
    return True


def _walk(node, path=()):
    if isinstance(node, dict):
        for k, v in node.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, node


def init_lora(params: Dict[str, Any], cfg: LoraConfig, seed: int = 0) -> Dict[str, Any]:
    """Build the LoRA tree: mirrors `params` nesting; at each adapted Dense
    dir, {"lora_a": (in, r) small-normal, "lora_b": (r, out) zeros} — so the
    adapter starts as an exact no-op (delta kernel is zero)."""
    rng = np.random.default_rng(seed)
    tree: Dict[str, Any] = {}
    n = 0
    for mod in cfg.modules:
        if mod not in params:
            raise ValueError(f"lora module {mod!r} not in params "
                             f"(have {sorted(params)})")
        for path, leaf in _walk(params[mod]):
            if not _adapted(cfg, path, leaf):
                continue
            d_in, d_out = leaf.shape
            a = (rng.standard_normal((d_in, cfg.rank)) / cfg.rank).astype(np.float32)
            b = np.zeros((cfg.rank, d_out), np.float32)
            node = tree.setdefault(mod, {})
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node["lora_a"] = a
            node["lora_b"] = b
            n += 1
    if n == 0:
        raise ValueError(
            f"LoRA placement matched no kernels (targets={cfg.targets}, "
            f"include={cfg.include!r}, modules={cfg.modules})")
    return tree


def _pairs(params: Dict[str, Any], lora: Dict[str, Any]):
    """Yield (module, dir_path, dense_dir_node, lora_dir_node) for every
    adapted Dense dir."""
    for mod, sub in lora.items():
        for path, _ in _walk(sub):
            if path[-1] != "lora_a":
                continue
            dense = params[mod]
            lnode = sub
            for k in path[:-1]:
                dense = dense[k]
                lnode = lnode[k]
            yield mod, path[:-1], dense, lnode


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any],
               cfg) -> Dict[str, Any]:
    """params with W + scale * (A @ B) at adapted kernels; every other leaf
    ALIASES the input (no copies — the base tree stays the single source of
    truth for 4.4 GB of frozen weights). Pure; jit at the call site so the
    whole merge is one program. `cfg`: a LoraConfig or a bare scale float."""
    s = cfg.scale if isinstance(cfg, LoraConfig) else float(cfg)

    def rebuild(node, lnode):
        if not isinstance(node, dict):
            return node
        if "lora_a" in lnode:
            w = node["kernel"]
            delta = (lnode["lora_a"].astype(jnp.float32)
                     @ lnode["lora_b"].astype(jnp.float32)) * s
            return {**node, "kernel": (w.astype(jnp.float32) + delta).astype(w.dtype)}
        return {k: rebuild(v, lnode[k]) if k in lnode else v
                for k, v in node.items()}

    return {mod: rebuild(params[mod], lora[mod]) if mod in lora else params[mod]
            for mod in params}


def lora_mask(params: Dict[str, Any], lora: Dict[str, Any]) -> Dict[str, Any]:
    """Full-pipeline bool mask: True ONLY at adapted kernels. Drives the
    existing grad-pruning machinery (piecewise backward programs return dense
    gradients for exactly the adapted kernels; everything else is dead-code
    -eliminated)."""
    adapted = {(mod,) + path + ("kernel",) for mod, path, _, _ in _pairs(params, lora)}
    out = {}
    for mod, sub in params.items():
        out[mod] = jax.tree_util.tree_map_with_path(
            lambda p, _l, _mod=mod: ((_mod,) + tuple(
                getattr(x, "key", str(x)) for x in p)) in adapted, sub)
    return out


def project_grads(dense_grads: Dict[str, Any], lora: Dict[str, Any],
                  cfg: LoraConfig) -> Dict[str, Any]:
    """Exact LoRA-factor gradients from dense kernel gradients:
    dL/dA = s * G @ B^T, dL/dB = s * A^T @ G (G = dL/dW at the merged point).
    `dense_grads` has the structure of params (None at non-adapted leaves,
    as produced under lora_mask)."""
    s = cfg.scale

    def rebuild(gnode, lnode):
        if "lora_a" in lnode:
            g = gnode["kernel"].astype(jnp.float32)
            a = lnode["lora_a"].astype(jnp.float32)
            b = lnode["lora_b"].astype(jnp.float32)
            return {"lora_a": (g @ b.T) * s, "lora_b": (a.T @ g) * s}
        return {k: rebuild(gnode[k], v) for k, v in lnode.items()}

    return {mod: rebuild(dense_grads[mod], sub) for mod, sub in lora.items()}


# ------------------------------------------------------------ torch interop

def lora_to_torch_state_dict(lora: Dict[str, Any],
                             cfg: Optional[LoraConfig] = None) -> Dict[str, np.ndarray]:
    """peft-layout export: `<module>.<torch prefix>.lora_A.weight` (r, in),
    `.lora_B.weight` (out, r). A scalar `lora_alpha` entry records the scale
    so a reload needs no side-channel config."""
    from ..io.torch_export import _flax_path_to_torch_key

    def prefix_of(mod, path):
        # drop the flax "params" level, like io/torch_export does
        parts = (mod,) + tuple(p for p in path if p != "params")
        return _flax_path_to_torch_key(parts)

    out: Dict[str, np.ndarray] = {}
    for mod, sub in lora.items():
        for path, leaf in _walk(sub):
            if path[-1] == "lora_a":
                out[f"{prefix_of(mod, path[:-1])}.lora_A.weight"] = \
                    np.asarray(leaf, np.float32).T
            elif path[-1] == "lora_b":
                out[f"{prefix_of(mod, path[:-1])}.lora_B.weight"] = \
                    np.asarray(leaf, np.float32).T
    if cfg is not None:
        out["lora_alpha"] = np.asarray(cfg.alpha, np.float32)
    return out


def lora_from_torch_state_dict(sd: Dict[str, Any], params: Dict[str, Any],
                               ) -> Tuple[Dict[str, Any], Optional[float]]:
    """Inverse of lora_to_torch_state_dict: rebuild the LoRA tree against the
    given base params (placement + shapes are validated against the actual
    kernels; unmatched adapter keys raise — the strict-loading stance of
    io/loaders.py). Returns (lora_tree, alpha_or_None)."""
    from ..io.torch_export import _flax_path_to_torch_key

    # prefix -> (module, original dir path incl. "params", kernel shape)
    prefix_map: Dict[str, Tuple[str, Tuple[str, ...], Tuple[int, int]]] = {}
    for mod, sub in params.items():
        for path, leaf in _walk(sub):
            if path and path[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2:
                prefix = _flax_path_to_torch_key(
                    (mod,) + tuple(p for p in path[:-1] if p != "params"))
                prefix_map[prefix] = (mod, path[:-1], tuple(leaf.shape))

    alpha = None
    tree: Dict[str, Any] = {}
    pending: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        if k == "lora_alpha":
            alpha = float(np.asarray(v))
            continue
        m = re.match(r"^(.*)\.lora_([AB])\.weight$", k)
        if not m:
            raise ValueError(f"not a LoRA adapter key: {k!r}")
        pending.setdefault(m.group(1), {})[m.group(2)] = np.asarray(v, np.float32)

    for prefix, ab in sorted(pending.items()):
        if prefix not in prefix_map:
            raise ValueError(f"adapter {prefix!r} matches no kernel in params")
        if set(ab) != {"A", "B"}:
            raise ValueError(f"adapter {prefix!r} missing lora_{'B' if 'A' in ab else 'A'}")
        mod, path, (d_in, d_out) = prefix_map[prefix]
        a, b = ab["A"].T, ab["B"].T  # torch (r,in)/(out,r) -> flax (in,r)/(r,out)
        if a.shape[0] != d_in or b.shape[1] != d_out or a.shape[1] != b.shape[0]:
            raise ValueError(
                f"adapter {prefix!r} shapes A{a.shape} B{b.shape} do not fit "
                f"kernel ({d_in}, {d_out})")
        node = tree.setdefault(mod, {})
        for kk in path:
            node = node.setdefault(kk, {})
        node["lora_a"] = a
        node["lora_b"] = b
    if not tree:
        raise ValueError("state dict contains no LoRA adapter keys")
    return tree, alpha


def load_and_merge_lora(params: Dict[str, Any], path: str,
                        scale: Optional[float] = None,
                        host_params: Optional[Dict[str, Any]] = None):
    """Inference-time adapter loading (cli/infer.py --lora_path): read a
    peft-layout checkpoint, validate it against the base params, and return
    the merged tree. `scale` overrides the checkpoint's alpha/rank.

    `host_params`: optional dict of HOST (numpy) copies of some top-level
    modules (the save_memory release/restore stash,
    pipeline._host_cond_params). When given, returns `(merged, merged_host)`
    where adapter-touched entries of `host_params` were merged ON HOST with
    plain numpy (merge_lora stays numpy on numpy inputs) — so releasing an
    adapted conditioning module later never needs the minutes-long
    device->host fallback (ADVICE r4: ~1.6 GB at ~10 MB/s)."""
    from ..io.torch_import import load_torch_checkpoint

    tree, alpha = lora_from_torch_state_dict(load_torch_checkpoint(path), params)
    if scale is None:
        if alpha is not None:
            rank = next(leaf.shape[1] for p, leaf
                        in jax.tree_util.tree_flatten_with_path(tree)[0]
                        if jax.tree_util.keystr(p).endswith("['lora_a']"))
            scale = alpha / rank
        else:
            scale = 1.0
    s = float(scale)
    # one program for the whole merge (per-kernel dispatch costs ~2.5 ms
    # each through the axon tunnel; there are ~10^2 adapted kernels) — but
    # only over the top-level modules the adapter actually touches: the
    # untouched subtrees pass through as the SAME buffers (no transient
    # HBM copy of e.g. the VAE, and callers can detect them via `is`)
    touched = {k: params[k] for k in tree}
    merged = jax.jit(lambda p, l: merge_lora(p, l, s))(touched, tree)
    out = dict(params)
    out.update(merged)
    if host_params is None:
        return out
    # numpy adapter factors so the host merge never touches a device
    tree_np = jax.tree_util.tree_map(np.asarray, tree)
    host_out = {
        k: (merge_lora({k: v}, {k: tree_np[k]}, s)[k] if k in tree_np else v)
        for k, v in host_params.items()}
    return out, host_out


# ------------------------------------------------------------ trainers

class LoraPiecewiseTrainer:
    """LoRA over the production piecewise training path: merge -> existing
    block-granular loss_and_grads (masked to the adapted kernels) -> exact
    factor-gradient projection -> optimizer on the factors only. Base params
    are never updated and never get gradient buffers."""

    def __init__(self, pipeline, tcfg, optimizer, lora_cfg: LoraConfig,
                 lora: Optional[Dict[str, Any]] = None, scheduler=None, seed: int = 0):
        from .piecewise_trainer import PiecewiseTrainer

        self.cfg = lora_cfg
        self.lora = lora if lora is not None else init_lora(
            pipeline.params, lora_cfg, seed=seed)
        self.mask = lora_mask(pipeline.params, self.lora)
        self.tx = optimizer
        self.inner = PiecewiseTrainer(pipeline, tcfg, optimizer, mask=self.mask,
                                      scheduler=scheduler)
        self._jits: Dict[str, Any] = {}

    def _jit(self, name, fn):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

    def step(self, state, batch, rng):
        """state: TrainState whose .params is the LORA tree (base params live
        on the pipeline and stay frozen)."""
        from .train_step import TrainState

        base = self.inner.m.params
        merged = self._jit("merge", lambda p, l: merge_lora(p, l, self.cfg))(
            base, state.params)
        loss, dense_grads = self.inner.loss_and_grads(merged, batch, rng)
        lgrads = self._jit("project", lambda g, l: project_grads(g, l, self.cfg))(
            {m: dense_grads[m] for m in self.lora}, state.params)

        def upd(lora, opt_state, grads, step):
            import optax

            updates, opt_state = self.tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, step + 1

        lora, opt_state, step_c = self._jit("update", upd)(
            state.params, state.opt_state, lgrads, state.step)
        return TrainState(lora, opt_state, step_c), {"loss": loss}


def build_lora_train_step(pipeline, tcfg, optimizer, lora_cfg: LoraConfig,
                          scheduler=None):
    """Monolithic (single-program) LoRA train step for hardware whose
    compiler handles whole-model graphs (CPU tests, real XLA:TPU builds):
    differentiates the existing train_step loss directly w.r.t. the factors
    through the merge. Returns (step_fn(state, batch, rng), loss_fn)."""
    import optax

    from .train_step import TrainState, build_train_step

    _, loss_fn = build_train_step(pipeline, tcfg, optimizer, scheduler=scheduler)
    base = pipeline.params

    def lora_loss(lora, batch, rng):
        return loss_fn(merge_lora(base, lora, lora_cfg), batch, rng)

    def step_fn(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(lora_loss)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        return TrainState(lora, opt_state, state.step + 1), {"loss": loss}

    return step_fn, lora_loss
