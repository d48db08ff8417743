"""Checkpoint format: write/read round-trip + converter parity + streaming."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rwkv_tpu.io import binfmt, registry
from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import (
    forward_step,
    init_params,
    init_state,
    quantize_params,
)


@pytest.fixture(scope="module")
def small_model():
    # Real vocab (the format hardcodes 50277) but tiny width/depth.
    cfg = RWKVConfig(n_layer=2, n_embd=16)
    params = quantize_params(init_params(jax.random.PRNGKey(3), cfg))
    return cfg, params


def test_layout_matches_reference_sizes():
    """Byte layout must equal the reference getSize()/types tables
    (rwkv.h:84,126) — spot-check several slots for a=6, b=512."""
    a, b = 6, 512
    layout = dict((n, (o, s)) for n, o, s in registry.file_layout(a, b))
    assert layout["xbuf"] == (16, b * 8)
    assert layout["embed"][1] == 50277 * b * 4
    assert layout["layernorms"][1] == 4 * (a + 1) * b * 8
    assert layout["km"][1] == a * b * b * 1
    assert layout["ffn_k"][1] == a * b * b * 4 * 1
    assert layout["ffn_vr"][1] == a * b * 4 * 4
    assert layout["head"][1] == 50277 * b * 1
    # total file size = header + sum of all 46
    total = 16 + sum(s for _, _, s in registry.file_layout(a, b))
    expected = 16 + sum(
        registry.tensor_nbytes(spec, a, b) for spec in registry.REGISTRY
    )
    assert total == expected


def test_roundtrip_forward_identical(tmp_path, small_model):
    cfg, params = small_model
    path = str(tmp_path / "model.bin")
    binfmt.write_bin(path, params)

    assert binfmt.read_header(path) == cfg
    loaded = binfmt.read_bin(path)

    state = init_state(cfg)
    tok = jnp.asarray(7)
    l0, s0 = forward_step(params, tok, state)
    l1, s1 = forward_step(loaded, tok, state)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5, atol=1e-5)
    for a_, b_ in zip(s0, s1):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5)


def test_u8_payload_bit_exact(tmp_path, small_model):
    cfg, params = small_model
    path = str(tmp_path / "model.bin")
    binfmt.write_bin(path, params)
    loaded = binfmt.read_bin(path)
    np.testing.assert_array_equal(np.asarray(loaded.att.key.w), np.asarray(params.att.key.w))
    np.testing.assert_array_equal(np.asarray(loaded.head.w), np.asarray(params.head.w))
    np.testing.assert_array_equal(
        np.asarray(loaded.ffn.key.scale), np.asarray(params.ffn.key.scale)
    )


def test_rejects_garbage(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 8)
    with pytest.raises(ValueError):
        binfmt.read_header(str(p))
    p.write_bytes(np.asarray([999999, 5], dtype="<i8").tobytes())
    with pytest.raises(ValueError):
        binfmt.read_header(str(p))


def test_custom_put_sees_every_model_tensor(tmp_path, small_model):
    """The streaming hook receives each tensor once — this is the seam the
    sharded loader uses."""
    cfg, params = small_model
    path = str(tmp_path / "model.bin")
    binfmt.write_bin(path, params)
    seen = []

    def put(name, arr):
        seen.append(name)
        return jnp.asarray(arr)

    binfmt.read_bin(path, put=put)
    assert "km" in seen and "head" in seen and "ln0.w" in seen
    # scratch buffers must not be loaded
    assert not (set(seen) & registry.SCRATCH)


def test_read_bin_pretile_matches(tmp_path, small_model):
    """read_bin(pretile=t) host-side re-layout == on-device pretile_params."""
    import jax.numpy as jnp

    from rwkv_tpu.io.binfmt import read_bin, write_bin
    from rwkv_tpu.models.rwkv4 import forward_step, init_state
    from rwkv_tpu.ops.pallas.decode_stack import pretile_params

    cfg, params = small_model
    path = str(tmp_path / "m.bin")
    write_bin(path, params)
    a = read_bin(path, pretile=8)
    b = pretile_params(read_bin(path), tile=8)
    assert a.att.key.w.ndim == 4
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # and the XLA forward consumes the 4-D layout identically
    st = init_state(params.config)
    l0, _ = forward_step(read_bin(path), jnp.asarray(3), st)
    l1, _ = forward_step(a, jnp.asarray(3), st)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=1e-5, atol=1e-5)


def test_take_tensor_streaming_discipline(small_model, tmp_path):
    """Load-RSS pins (BENCH_NOTES round-4 "Host RAM during load"):
    _take_tensor must hand back an OWNED array with its file mapping
    already closed — holding 46 live memmaps made a 1.5B load 2.4x the
    file size in host RSS — and the safetensors view's release() must
    leave existing numpy views readable (pages refault)."""
    from rwkv_tpu.io.binfmt import write_bin, _take_tensor, read_header
    from rwkv_tpu.io.registry import REGISTRY, file_layout

    cfg, params = small_model
    path = str(tmp_path / "m.bin")
    write_bin(path, params)
    a, b = cfg.n_layer, cfg.n_embd
    layout = {
        name: (off, spec._replace(shape=spec.shape(a, b)))
        for (name, off, _), spec in zip(file_layout(a, b), REGISTRY)
    }
    for name in ("km", "embed", "layernorms"):
        arr = _take_tensor(path, layout, name)
        assert arr.flags.owndata and arr.flags.writeable, name
    conv = _take_tensor(path, layout, "decay", np.float32)
    assert conv.dtype == np.float32 and conv.flags.owndata


def test_safetensors_release_keeps_views_valid(tmp_path):
    from rwkv_tpu.io.safetensors import SafetensorsFile, write_safetensors

    ref = {"a": np.arange(64, dtype=np.float32).reshape(8, 8),
           "b": np.full((4, 4), 3, dtype=np.int8)}
    path = str(tmp_path / "t.safetensors")
    write_safetensors(path, ref)
    f = SafetensorsFile(path)
    view = f["a"]                   # zero-copy view over the mapping
    f.release()                     # drop resident pages
    np.testing.assert_array_equal(view, ref["a"])   # refaults fine
    np.testing.assert_array_equal(f["b"], ref["b"])  # fresh read too
    f.release()                     # idempotent


def test_read_bin_signed_matches_device_signedize(small_model, tmp_path):
    """read_bin(signed=True) must equal to_signed(read_bin()) exactly —
    the host-side XOR-0x80 re-center exists because upload-then-signedize
    holds u8+s8 copies of every family on device and ResourceExhausts a
    16GB chip at 14B (tools/load_rss_probe.py caught it live)."""
    from rwkv_tpu.io.binfmt import read_bin, write_bin
    from rwkv_tpu.models.rwkv4 import signedize_params

    cfg, params = small_model
    path = str(tmp_path / "m.bin")
    write_bin(path, params)

    ref = signedize_params(read_bin(path, pad_vocab_to=512))
    got = read_bin(path, pad_vocab_to=512, signed=True)
    assert got.att.key.w.dtype == np.int8
    assert got.head.w.dtype == np.int8
    for x, y in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # and with the pretile layout on top
    ref_pt = signedize_params(read_bin(path, pretile=8))
    got_pt = read_bin(path, pretile=8, signed=True)
    for x, y in zip(jax.tree.leaves(got_pt), jax.tree.leaves(ref_pt)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
