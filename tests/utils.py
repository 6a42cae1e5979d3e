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


def make_tiny_pipeline():
    """Full-structure tiny pipeline with DETERMINISTIC PRNGKey(0) init —
    shared by the e2e tests and the self-golden regression net."""
    import jax.numpy as jnp

    from vexpress_tpu.models.unet_3d import UNetConfig
    from vexpress_tpu.models.vae import VAEConfig
    from vexpress_tpu.models.wav2vec2 import Wav2Vec2Config
    from vexpress_tpu.pipelines.pipeline import PipelineModels, VExpressPipeline

    models = PipelineModels(
        unet_config=UNetConfig(
            block_out_channels=(8, 16, 16, 16),
            attention_head_dim=2,
            cross_attention_dim=12,
            norm_num_groups=4,
            motion_num_attention_heads=2,
            motion_max_len=8,
        ),
        vae_config=VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1, norm_num_groups=4),
        wav2vec2_config=Wav2Vec2Config(
            hidden_size=16,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=32,
            conv_dim=(8, 8),
            conv_kernel=(10, 3),
            conv_stride=(5, 2),
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        ),
        audio_projection_kwargs=dict(
            dim=16, depth=1, dim_head=4, heads=2, num_queries=5,
            embedding_dim=16, output_dim=12, max_seq_len=10,
        ),
        guider_kwargs=dict(conditioning_embedding_channels=8, block_out_channels=(4, 4, 8, 8)),
    )

    key = jax.random.PRNGKey(0)
    H = W = 64
    h = w = H // 8
    pipe_shell = VExpressPipeline(models, params={})
    params = {}
    params["vae"] = pipe_shell.vae.init(key, jnp.zeros((1, H, W, 3)))
    params["reference_net"] = pipe_shell.reference_net.init(
        key, jnp.zeros((1, h, w, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 12))
    )
    shapes = models.unet_config.ref_feature_shapes(h, w)
    ref_feats = tuple(jnp.zeros((1, l, c)) for l, c in shapes)
    params["denoising_unet"] = pipe_shell.denoising_unet.init(
        key, jnp.zeros((1, 2, h, w, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 5, 12)), ref_feats, jnp.zeros((1, 2, h, w, 8)),
    )
    params["v_kps_guider"] = pipe_shell.v_kps_guider.init(key, jnp.zeros((1, 1, H, W, 3)))
    params["wav2vec2"] = pipe_shell.audio_encoder.init(key, jnp.zeros((1, 1600)))
    params["audio_projection"] = pipe_shell.audio_projection.init(key, jnp.zeros((1, 10, 16)))
    return VExpressPipeline(models, params)
