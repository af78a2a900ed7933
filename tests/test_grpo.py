"""GRPO core tests: advantage math vs torch semantics, analytic loss values
under the on-policy ratio trick, fix_vit gradient freezing, end-to-end tiny
train steps (SURVEY §7 test strategy: tiny-model E2E GRPO with fake video)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_model_parity import CFG
from time_r1_tpu.models.qwen25vl import init_params
from time_r1_tpu.rl import (
    GRPOHyperParams,
    build_grpo_batch,
    compute_group_advantages,
    grpo_loss,
    make_train_step,
)
from time_r1_tpu.rl.grpo import compute_ref_logps


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def test_advantages_match_torch_std():
    import torch

    rewards = np.array([0.1, 0.9, 0.5, 0.5, 1.0, 0.0, 0.3, 0.2], np.float32)
    G = 4
    got = compute_group_advantages(rewards, G)
    r = torch.tensor(rewards)
    mean = r.view(-1, G).mean(dim=1).repeat_interleave(G)
    std = r.view(-1, G).std(dim=1).repeat_interleave(G)  # unbiased by default
    want = ((r - mean) / (std + 1e-4)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _toy_batch(params, G=4, with_ref=False, hp=None):
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(2, 200, 6))
    comps = [list(rng.integers(2, 200, n)) + [CFG.eos_token_id] for n in (3, 5, 2, 4)]
    adv = np.array([1.0, -0.5, 0.25, -0.75], np.float32)
    batch = build_grpo_batch(CFG, prompt, comps, adv, dtype=jnp.float32)
    if with_ref:
        ref_logps = compute_ref_logps(params, CFG, hp, batch)
        batch = batch._replace(ref_logps=ref_logps)
    return batch, adv, comps


def test_grpo_loss_analytic_onpolicy(params):
    """On-policy forward pass: ratio ≡ 1, so
    use_grpo=True  → loss = -mean(advantages)
    use_grpo=False → loss = -Σ adv_g·len_g / Σ len_g   (global token mean),
    and KL vs identical ref weights is 0."""
    hp = GRPOHyperParams(num_generations=4, beta=0.04, use_grpo=True)
    batch, adv, comps = _toy_batch(params, with_ref=True, hp=hp)
    loss, metrics = grpo_loss(params, CFG, hp, batch)
    np.testing.assert_allclose(float(loss), -adv.mean(), atol=1e-5)
    assert abs(float(metrics["kl"])) < 1e-6

    hp2 = GRPOHyperParams(num_generations=4, beta=0.0, use_grpo=False)
    loss2, metrics2 = grpo_loss(params, CFG, hp2, batch)
    lens = np.array([len(c) for c in comps], np.float32)  # incl. eos
    want = -(adv * lens).sum() / lens.sum()
    np.testing.assert_allclose(float(loss2), want, atol=1e-5)
    np.testing.assert_allclose(float(metrics2["completion_length"]), lens.mean(), atol=1e-6)


def test_grpo_gradients_nonzero_and_fixvit(params):
    import optax

    hp = GRPOHyperParams(num_generations=4, beta=0.0, use_grpo=False, fix_vit=True)
    batch, _, _ = _toy_batch(params)

    # add a tiny video so the vision path participates
    rng = np.random.default_rng(1)
    grid = (2, 4, 4)
    n_vis = 2 * 2 * 2
    prompt = (
        [5, 6]
        + [CFG.vision_start_token_id]
        + [CFG.video_token_id] * n_vis
        + [CFG.vision_end_token_id]
        + [7]
    )
    comps = [list(rng.integers(2, 200, n)) + [CFG.eos_token_id] for n in (3, 2, 4, 3)]
    patches = rng.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32)
    batch = build_grpo_batch(
        CFG, prompt, comps, np.array([1.0, -1.0, 0.5, -0.5], np.float32),
        patches=patches, grid_thw=grid, second_per_grid_t=1.0, dtype=jnp.float32,
    )

    opt = optax.adamw(1e-3)
    step = make_train_step(CFG, hp, opt)
    new_params, _, loss, metrics = step(params, opt.init(params), batch)
    assert np.isfinite(float(loss))
    # text params updated
    d_text = float(
        jnp.abs(
            new_params["text"]["layers"]["mlp"]["gate_w"] - params["text"]["layers"]["mlp"]["gate_w"]
        ).max()
    )
    assert d_text > 0
    # merger updated, ViT blocks frozen (fix_vit semantics, trainer.py:272-288)
    d_merger = float(
        jnp.abs(new_params["visual"]["merger"]["fc1"]["kernel"] - params["visual"]["merger"]["fc1"]["kernel"]).max()
    )
    d_blocks = float(
        jnp.abs(new_params["visual"]["blocks"]["attn"]["qkv_w"] - params["visual"]["blocks"]["attn"]["qkv_w"]).max()
    )
    assert d_merger > 0
    assert d_blocks == 0.0


def test_clip_loss_bounds_update(params):
    """PPO-clip: scaling advantages has bounded effect once ratio clamps —
    sanity that coef_2 path participates (grad through min)."""
    hp = GRPOHyperParams(num_generations=4, beta=0.0, use_grpo=False)
    batch, adv, _ = _toy_batch(params)
    g1 = jax.grad(lambda p: grpo_loss(p, CFG, hp, batch)[0])(params)
    n1 = optax_global_norm(g1)
    assert n1 > 0


def optax_global_norm(tree):
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree))))


def test_vision_dedup_matches_replicated_oracle(params):
    """build_grpo_batch_groups carries each video's patches ONCE and scatters
    its features to all G rows via per-row feature offsets; the loss must
    match the replicated-vision oracle (one patch copy per row — the
    reference's B·G-row forward, timer1_trainer.py:601-607)."""
    rng = np.random.default_rng(5)
    hp = GRPOHyperParams(num_generations=2, beta=0.0, use_grpo=False, fix_vit=True)

    def make_group(seed, g=2):
        r = np.random.default_rng(seed)
        grid = (2, 4, 4)
        n_vis = 2 * 2 * 2
        prompt = (
            list(r.integers(2, 200, 3))
            + [CFG.vision_start_token_id]
            + [CFG.video_token_id] * n_vis
            + [CFG.vision_end_token_id]
            + [7]
        )
        return {
            "prompt_ids": prompt,
            # fixed length so the single-completion oracle groups left-pad
            # identically (same Cmax per group)
            "completions": [
                list(r.integers(2, 200, 4)) + [CFG.eos_token_id] for _ in range(g)
            ],
            "advantages": r.normal(size=g).astype(np.float32),
            "patches": r.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32),
            "grid_thw": grid,
            "second_per_grid_t": 1.0,
        }

    from time_r1_tpu.rl import build_grpo_batch_groups

    groups = [make_group(11), make_group(22)]
    dedup = build_grpo_batch_groups(CFG, groups, pad_to=64, dtype=jnp.float32)
    # each video's patches appear ONCE (2 videos × 32 patch rows, padded)
    assert dedup.feat_offsets is not None
    np.testing.assert_array_equal(np.asarray(dedup.feat_offsets), [0, 0, 8, 8])

    # oracle: one single-completion group per row → per-row patch copies
    replicated_groups = []
    for g in groups:
        for comp, adv in zip(g["completions"], g["advantages"]):
            replicated_groups.append(
                {**g, "completions": [comp], "advantages": np.array([adv], np.float32)}
            )
    replicated = build_grpo_batch_groups(CFG, replicated_groups, pad_to=64, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(dedup.input_ids), np.asarray(replicated.input_ids))
    np.testing.assert_array_equal(
        np.asarray(dedup.position_ids), np.asarray(replicated.position_ids)
    )

    l_d, m_d = grpo_loss(params, CFG, hp, dedup)
    l_r, m_r = grpo_loss(params, CFG, hp, replicated)
    np.testing.assert_allclose(float(l_d), float(l_r), rtol=1e-5, atol=1e-6)
    for k in m_d:
        np.testing.assert_allclose(float(m_d[k]), float(m_r[k]), rtol=1e-4, atol=1e-5)


def _mk_groups(with_video: bool, G: int = 3, P: int = 2):
    groups = []
    for gi in range(P):
        r = np.random.default_rng(100 + gi)
        if with_video:
            n_vis = 2 * 2 * 2
            prompt = (
                list(r.integers(2, 200, 3 + gi))
                + [CFG.vision_start_token_id]
                + [CFG.video_token_id] * n_vis
                + [CFG.vision_end_token_id]
                + [7]
            )
        else:
            prompt = list(r.integers(2, 200, 9 + gi))
        g = {
            "prompt_ids": prompt,
            "completions": [
                list(r.integers(2, 200, 3 + j)) + [CFG.eos_token_id] for j in range(G)
            ],
            "advantages": r.normal(size=G).astype(np.float32),
        }
        if with_video:
            g.update(
                patches=r.normal(size=(2 * 4 * 4, CFG.vision.patch_input_dim)).astype(np.float32),
                grid_thw=(2, 4, 4),
                second_per_grid_t=1.0,
            )
        groups.append(g)
    return groups


@pytest.mark.parametrize("with_video", [False, True])
@pytest.mark.parametrize("beta", [0.0, 0.04])
def test_split_batch_loss_matches_full_rows(params, with_video, beta):
    """The shared-prefix loss (GRPOSplitBatch: prompt forward once per prompt,
    completion chunk per row over mha_shared_prefix) must match the full
    concatenated-rows path: positions, loss, metrics, AND gradients."""
    from time_r1_tpu.rl import build_grpo_batch_groups
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    G = 3
    hp = GRPOHyperParams(num_generations=G, beta=beta, use_grpo=False, fix_vit=with_video)
    groups = _mk_groups(with_video, G=G)
    full = build_grpo_batch_groups(CFG, groups, dtype=jnp.float32)
    split = build_grpo_split_batch(CFG, groups, dtype=jnp.float32)

    # position parity: each row's completion positions in the full layout
    # must equal the split chunk's positions
    full_pos = np.asarray(full.position_ids)
    attn = np.asarray(full.attention_mask)
    comp = np.asarray(full.completion_mask)
    ri = 0
    for g in groups:
        for c in g["completions"]:
            Lpr = len(g["prompt_ids"])
            start_col = int(np.argmax(attn[ri] == 1)) + Lpr
            want = full_pos[:, ri, start_col : start_col + len(c)]
            got = np.asarray(split.comp_pos)[:, ri, : len(c)]
            np.testing.assert_array_equal(got, want)
            ri += 1
    del comp

    if beta != 0.0:
        full = full._replace(ref_logps=compute_ref_logps(params, CFG, hp, full))
        split = split._replace(ref_logps=compute_ref_logps(params, CFG, hp, split))

    (l_f, m_f), g_f = jax.value_and_grad(
        lambda p: grpo_loss(p, CFG, hp, full), has_aux=True
    )(params)
    (l_s, m_s), g_s = jax.value_and_grad(
        lambda p: grpo_loss(p, CFG, hp, split), has_aux=True
    )(params)
    np.testing.assert_allclose(float(l_s), float(l_f), rtol=2e-5, atol=2e-6)
    for k in m_f:
        np.testing.assert_allclose(float(m_s[k]), float(m_f[k]), rtol=2e-4, atol=2e-5)
    flat_f = jax.tree.leaves(g_f)
    flat_s = jax.tree.leaves(g_s)
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("split", [False, True])
def test_mixed_video_and_text_groups(params, split):
    """A batch mixing a video group and a text-only group must build with
    row-aligned feat_offsets and produce the same loss as two separate
    single-modality batches would imply (regression: offsets were built only
    for video rows, crashing merge_vision_embeddings on mixed batches)."""
    from time_r1_tpu.rl import build_grpo_batch_groups
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    G = 2
    hp = GRPOHyperParams(num_generations=G, beta=0.0, use_grpo=False, fix_vit=True)
    vgroups = _mk_groups(True, G=G, P=1)
    tgroups = _mk_groups(False, G=G, P=1)
    mixed = vgroups + tgroups
    if split:
        batch = build_grpo_split_batch(CFG, mixed, dtype=jnp.float32)
        assert batch.feat_offsets.shape[0] == 2  # one offset per PROMPT
    else:
        batch = build_grpo_batch_groups(CFG, mixed, dtype=jnp.float32)
        assert batch.feat_offsets.shape[0] == 2 * G  # one offset per ROW
    loss, metrics = grpo_loss(params, CFG, hp, batch)
    assert np.isfinite(float(loss))

    # cross-layout agreement pins the mixed-batch math end to end
    other = (
        build_grpo_batch_groups(CFG, mixed, dtype=jnp.float32)
        if split
        else build_grpo_split_batch(CFG, mixed, dtype=jnp.float32)
    )
    loss2, _ = grpo_loss(params, CFG, hp, other)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("split", [False, True])
def test_precompute_frozen_vision_matches_inline(params, split):
    """fix_vit: running the frozen ViT blocks as their own program
    (precompute_frozen_vision → batch.vision_hidden; the loss runs only the
    trainable merger) must match the inline vision_forward path bitwise —
    loss, metrics AND grads (merger grads flow either way, blocks get none)."""
    from time_r1_tpu.rl import build_grpo_batch_groups
    from time_r1_tpu.rl.grpo import precompute_frozen_vision
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    hp = GRPOHyperParams(num_generations=3, beta=0.0, use_grpo=False, fix_vit=True)
    groups = _mk_groups(True, G=3, P=2)
    build = build_grpo_split_batch if split else build_grpo_batch_groups
    inline = build(CFG, groups, dtype=jnp.float32)
    pre = precompute_frozen_vision(params, CFG, inline)
    assert pre.vision_hidden is not None
    assert precompute_frozen_vision(params, CFG, pre) is pre  # idempotent

    def loss_fn(p, b):
        return grpo_loss(p, CFG, hp, b)

    (l_i, m_i), g_i = jax.value_and_grad(loss_fn, has_aux=True)(params, inline)
    (l_p, m_p), g_p = jax.value_and_grad(loss_fn, has_aux=True)(params, pre)
    np.testing.assert_allclose(float(l_i), float(l_p), rtol=1e-6, atol=1e-7)
    for k in m_i:
        np.testing.assert_allclose(float(m_i[k]), float(m_p[k]), rtol=1e-5, atol=1e-6)
    # merger grads present and equal; frozen block grads zero in BOTH paths
    for (path_i, a), (path_p, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_i)[0],
        jax.tree_util.tree_flatten_with_path(g_p)[0],
    ):
        assert path_i == path_p
        name = jax.tree_util.keystr(path_i)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=name
        )
        if "blocks" in name or "patch_embed" in name:
            assert float(jnp.abs(a).max()) == 0.0, name
    merger_g = g_p["visual"]["merger"]["fc1"]["kernel"]
    assert float(jnp.abs(merger_g).max()) > 0


@pytest.mark.parametrize("split", [False, True])
def test_inscan_lora_matches_full_merge(params, split):
    """make_lora_train_step's in-scan per-layer merge (decoder adapters scan
    with the layers; no full merged tree in the grad program — the 3B merged
    copy OOMs a 16 GB chip) must match the merge-everything oracle: loss and
    adapter grads identical."""
    from time_r1_tpu.rl import build_grpo_batch_groups
    from time_r1_tpu.rl.lora import LoRAConfig, init_lora, lora_layers_tree, merge_lora
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    hp = GRPOHyperParams(
        num_generations=3, beta=0.0, use_grpo=False, fix_vit=True,
        gradient_checkpointing=True,
    )
    groups = _mk_groups(True, G=3, P=2)
    build = build_grpo_split_batch if split else build_grpo_batch_groups
    batch = build(CFG, groups, dtype=jnp.float32)

    lcfg = LoRAConfig(rank=4, alpha=8.0)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    lora = {k: v for k, v in lora.items() if not k.startswith("visual")}
    assert lora and all(k.startswith("text/layers/") for k in lora)
    # B=0 at init makes the delta vanish — perturb so the paths must agree on
    # a nontrivial merge
    lora = jax.tree.map(lambda a: a + 0.01, lora)

    def loss_inscan(ad):
        tree, rest = lora_layers_tree(ad)
        assert not rest
        return grpo_loss(params, CFG, hp, batch, lora=(tree, lcfg.scaling))[0]

    def loss_merged(ad):
        return grpo_loss(merge_lora(params, ad, lcfg), CFG, hp, batch)[0]

    (l_i, g_i) = jax.value_and_grad(loss_inscan)(lora)
    (l_m, g_m) = jax.value_and_grad(loss_merged)(lora)
    np.testing.assert_allclose(float(l_i), float(l_m), rtol=1e-6, atol=1e-7)
    for (p_i, a), (p_m, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_i)[0],
        jax.tree_util.tree_flatten_with_path(g_m)[0],
    ):
        assert p_i == p_m
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6,
            err_msg=jax.tree_util.keystr(p_i),
        )
        assert float(jnp.abs(a).max()) > 0, jax.tree_util.keystr(p_i)


@pytest.mark.parametrize("policy", ["dots", "dots_small"])
def test_remat_policy_matches_full(params, policy):
    """Selective gradient checkpointing (language.REMAT_POLICIES): saving
    projection outputs as backward residuals changes WHAT is recomputed, not
    the math — loss and grads must match the save-layer-inputs-only 'full'
    policy bit-for-bit up to float reassociation."""
    from time_r1_tpu.rl.rollout import build_grpo_split_batch

    groups = _mk_groups(True, G=3, P=2)
    batch = build_grpo_split_batch(CFG, groups, dtype=jnp.float32)

    def loss_with(remat):
        hp = GRPOHyperParams(
            num_generations=3, beta=0.0, use_grpo=False, fix_vit=True,
            gradient_checkpointing=remat,
        )
        return jax.value_and_grad(
            lambda p: grpo_loss(p, CFG, hp, batch)[0], has_aux=False
        )(params)

    l_full, g_full = loss_with("full")
    l_pol, g_pol = loss_with(policy)
    np.testing.assert_allclose(float(l_full), float(l_pol), rtol=1e-6, atol=1e-7)
    for (p_a, a), (p_b, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_full)[0],
        jax.tree_util.tree_flatten_with_path(g_pol)[0],
    ):
        assert p_a == p_b
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6,
            err_msg=jax.tree_util.keystr(p_a),
        )
