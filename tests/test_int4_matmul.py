"""Pallas int4 dequant-matmul (ops/int4_matmul.py) vs the XLA unpack oracle,
plus the engine-level int4 weight-only serving path (vLLM int4/AWQ capability
class — kept for HBM capacity; int8 remains the throughput default, see
docs/ROADMAP.md measurements)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from time_r1_tpu.ops.int4_matmul import int4_matmul, int4_matmul_reference
from time_r1_tpu.ops.quant import quantize_weight


@pytest.mark.parametrize(
    "M,K,N",
    [
        (8, 256, 384),  # block-aligned
        (3, 64, 128),  # small M (padded to sublane)
        (8, 254, 130),  # requires K and N padding
        (1, 2048, 640),  # decode row
    ],
)
def test_kernel_matches_unpack_oracle(M, K, N):
    rng = np.random.default_rng(0)
    K -= K % 2
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    q = quantize_weight(w, bits=4)
    assert q["q4"].dtype == jnp.uint8
    want = int4_matmul_reference(x, q["q4"], q["s"])
    got = int4_matmul(x, q["q4"], q["s"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_qmatmul_routes_q4(monkeypatch):
    """qmatmul on a 3D activation with a q4 weight matches the unpack math
    (the TPU fast path reshapes through the kernel; CPU uses the oracle)."""
    from time_r1_tpu.ops.quant import qmatmul

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    q = quantize_weight(w, bits=4)
    got = qmatmul(x, q)
    want = int4_matmul_reference(x.reshape(6, 64), q["q4"], q["s"]).reshape(2, 3, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_engine_int4_greedy_tracks_int8(jx_params=None):
    """int4 weight-only serving: greedy decode agrees with the int8 engine on
    most tiny-model requests (both quantize the same bf16 tree; int4 adds
    ~1 extra bit of weight noise)."""
    from test_model_parity import CFG
    from time_r1_tpu.models.qwen25vl import init_params
    from time_r1_tpu.sampler import Engine, Request, SamplingParams

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    reqs = [Request(input_ids=list(rng.integers(2, 200, int(n)))) for n in (9, 17, 25)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, stop_token_ids=CFG.stop_token_ids)
    out4 = Engine(params, CFG, dtype=jnp.float32, quantization="int4").generate(reqs, sp)
    out8 = Engine(params, CFG, dtype=jnp.float32, quantization="int8").generate(reqs, sp)
    assert len(out4) == len(out8) == 3
    for row in out4:
        assert 0 < len(row) <= sp.max_new_tokens
    # embedding/head stay int8 in both trees; only layer matmuls differ
    agree = sum(a == b for a, b in zip(out4, out8))
    assert agree >= 2, (out4, out8)
