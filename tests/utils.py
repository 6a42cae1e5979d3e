import numpy as np
import jax

from vexpress_tpu.io.torch_import import convert_torch_state_dict


def flax_params_from_torch(module_torch):
    """state_dict() -> {"params": nested flax tree}."""
    return {"params": convert_torch_state_dict(module_torch.state_dict())}


def t2j(x, channels_last=True):
    """torch (N,C,H,W)->jax (N,H,W,C) numpy; passthrough for non-4D."""
    a = x.detach().cpu().numpy()
    if channels_last and a.ndim == 4:
        a = a.transpose(0, 2, 3, 1)
    return a


def assert_close(a, b, atol=2e-5, rtol=2e-5, msg=""):
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)


def assert_tree_structs_match(init_params, imported_params):
    """Every param the flax module expects must be present with matching shape."""
    flat_init = jax.tree_util.tree_flatten_with_path(init_params)[0]
    flat_imp = dict(jax.tree_util.tree_flatten_with_path(imported_params)[0])
    missing = []
    mismatched = []
    for path, leaf in flat_init:
        if path not in flat_imp:
            missing.append(jax.tree_util.keystr(path))
        elif tuple(leaf.shape) != tuple(flat_imp[path].shape):
            mismatched.append((jax.tree_util.keystr(path), leaf.shape, flat_imp[path].shape))
    extra = [jax.tree_util.keystr(p) for p, _ in flat_imp.items() if p not in dict(jax.tree_util.tree_flatten_with_path(init_params)[0])]
    assert not missing and not mismatched, f"missing={missing[:10]} mismatched={mismatched[:10]} extra={extra[:10]}"
