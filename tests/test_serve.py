"""Streaming serving: parity with chunked batch eval + CLI e2e."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.models.basicvsr import BasicVSR
from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply
from mobilesuperresolution_tpu.serve import StreamingVSR


@pytest.fixture(scope="module")
def tiny_vsr():
    model = BasicVSR(num_feat=8, num_block=1, scale=2)
    x = jnp.zeros((1, 7, 16, 20, 3))
    variables = model.init(jax.random.key(0), x, 32, 40)
    apply_fn = jax.jit(
        lambda x, oh, ow: model.apply(variables, x, oh, ow),
        static_argnums=(1, 2),
    )
    return apply_fn


def test_streaming_matches_chunked(tiny_vsr, rng):
    """Pushing a clip frame-by-frame == chunked_vsr_apply on the whole clip,
    bit for bit (same windows, same compiled program)."""
    t, h, w = 14, 16, 20
    chunk, overlap = 3, 2
    clip = rng.random((1, t, h, w, 3)).astype(np.float32)

    want = np.asarray(
        chunked_vsr_apply(tiny_vsr, jnp.asarray(clip), 32, 40, chunk, overlap)
    )

    stream = StreamingVSR(tiny_vsr, 32, 40, chunk=chunk, overlap=overlap)
    got = []
    for i in range(t):
        frames = stream.push(clip[0, i])
        for fr in frames:
            got.append(fr)
    got.extend(stream.flush())

    assert len(got) == t
    np.testing.assert_array_equal(np.stack(got)[None], want)


def test_streaming_matches_chunked_quantized(rng):
    """The serve/batch bit-identity contract holds for the int8 quantized
    model too (dynamic activation scales are a pure function of the window
    content, and streamed windows == chunked windows)."""
    model = BasicVSR(num_feat=8, num_block=1, scale=2, quantized=True)
    x = jnp.zeros((1, 7, 16, 20, 3))
    variables = model.init(jax.random.key(0), x, 32, 40)
    apply_fn = jax.jit(
        lambda x, oh, ow: model.apply(variables, x, oh, ow),
        static_argnums=(1, 2),
    )
    t, h, w = 9, 16, 20
    chunk, overlap = 3, 2
    clip = rng.random((1, t, h, w, 3)).astype(np.float32)
    want = np.asarray(
        chunked_vsr_apply(apply_fn, jnp.asarray(clip), 32, 40, chunk, overlap)
    )
    stream = StreamingVSR(apply_fn, 32, 40, chunk=chunk, overlap=overlap)
    got = []
    for i in range(t):
        got.extend(stream.push(clip[0, i]))
    got.extend(stream.flush())
    assert len(got) == t
    np.testing.assert_array_equal(np.stack(got)[None], want)


def test_streaming_emission_order_and_lookahead(tiny_vsr, rng):
    """Outputs appear in order, and output j is never emitted before input
    j + ... arrives — i.e. emission respects the bounded-lookahead contract
    (never ahead of the dispatch rule next_start <= seen - chunk - overlap
    + chunk)."""
    t, h, w = 11, 16, 20
    chunk, overlap = 2, 1
    clip = rng.random((1, t, h, w, 3)).astype(np.float32)
    stream = StreamingVSR(tiny_vsr, 32, 40, chunk=chunk, overlap=overlap)
    emitted = 0
    for i in range(t):
        out = stream.push(clip[0, i])
        emitted += len(out)
        # dispatchable outputs after seeing i+1 frames:
        seen = i + 1
        max_dispatched = max(0, seen - chunk - overlap + 1)
        # emitted outputs come in multiples of full windows behind dispatch
        assert emitted <= ((max_dispatched + chunk - 1) // chunk) * chunk
    rest = stream.flush()
    emitted += len(rest)
    assert emitted == t
    with pytest.raises(RuntimeError):
        stream.push(clip[0, 0])


def test_streaming_rejects_bad_config(tiny_vsr):
    with pytest.raises(ValueError):
        StreamingVSR(tiny_vsr, 32, 40, chunk=0)
    with pytest.raises(ValueError):
        StreamingVSR(tiny_vsr, 32, 40, chunk=2, overlap=-1)
    with pytest.raises(ValueError):
        StreamingVSR(tiny_vsr, 32, 40, num_streams=0)
    s = StreamingVSR(tiny_vsr, 32, 40, num_streams=2)
    with pytest.raises(ValueError):
        s.push(np.zeros((3, 16, 20, 3), np.float32))


def test_multistream_matches_solo(tiny_vsr, rng):
    """S lockstep streams batched into one program == each stream served
    alone. Every model op is batch-independent, but the batch size is part
    of the compiled program, so XLA may re-tile reductions — outputs agree
    to float ulp level (measured max 6e-8 abs), not bit-for-bit."""
    s_n, t, h, w = 3, 9, 16, 20
    chunk, overlap = 2, 2
    clips = rng.random((s_n, t, h, w, 3)).astype(np.float32)

    solo = []
    for s in range(s_n):
        stream = StreamingVSR(tiny_vsr, 32, 40, chunk=chunk, overlap=overlap)
        got = []
        for i in range(t):
            got.extend(stream.push(clips[s, i]))
        got.extend(stream.flush())
        solo.append(np.stack(got))

    multi = StreamingVSR(
        tiny_vsr, 32, 40, chunk=chunk, overlap=overlap, num_streams=s_n
    )
    got = []
    for i in range(t):
        got.extend(multi.push(clips[:, i]))
    got.extend(multi.flush())
    assert len(got) == t
    stacked = np.stack(got, axis=1)  # (S, T, OH, OW, C)
    np.testing.assert_allclose(stacked, np.stack(solo), atol=1e-6, rtol=1e-5)


def test_streaming_spatial_shards_matches_plain(eight_devices, rng):
    """Multi-chip serving (VERDICT r3 item 8): one stream's window program
    sharded on frame HEIGHT over 8 virtual devices
    (parallel/vsr_spatial.py) must stream the same frames as single-device
    streaming — the route past the single-chip exact throughput ceiling."""
    from helpers.meshes import spatial_mesh
    from mobilesuperresolution_tpu.parallel.vsr_spatial import (
        spatial_basicvsr_forward,
    )

    model = BasicVSR(num_feat=8, num_block=1, scale=4)
    t, h, w = 10, 96, 32  # 96 rows / 8 shards = 12 >= rt(3) + max_disp(8)
    oh, ow = 4 * h, 4 * w
    chunk, overlap = 3, 2
    clip = rng.random((1, t, h, w, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(0), clip[:, :chunk + 2 * overlap], oh, ow
    )

    plain_fn = jax.jit(
        lambda x, a, b: model.apply(variables, x, a, b), static_argnums=(1, 2)
    )
    mesh = spatial_mesh(eight_devices, 8)
    sp_fn = jax.jit(
        lambda x, a, b: spatial_basicvsr_forward(
            model, variables["params"], x, a, b, mesh, max_disp=8
        ),
        static_argnums=(1, 2),
    )

    def run(fn):
        stream = StreamingVSR(fn, oh, ow, chunk=chunk, overlap=overlap)
        got = []
        for i in range(t):
            got.extend(stream.push(clip[0, i]))
        got.extend(stream.flush())
        return np.stack(got)

    want = run(plain_fn)
    got = run(sp_fn)
    assert got.shape == want.shape == (t, oh, ow, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_flow_cached_spatial_shards_matches_plain(eight_devices, rng):
    """--flow_cache composes with --spatial_shards: cached pair flows feed
    the height-sharded window program (make_flow_sr_fns' mesh path) and the
    streamed frames still match plain single-device streaming."""
    from helpers.meshes import spatial_mesh
    from mobilesuperresolution_tpu.serve import (
        FlowCachedStreamingVSR,
        make_flow_sr_fns,
    )

    model = BasicVSR(num_feat=8, num_block=1, scale=4)
    t, h, w = 10, 96, 32  # 96 rows / 8 shards = 12 >= rt(3) + max_disp(8)
    oh, ow = 4 * h, 4 * w
    chunk, overlap = 3, 2
    clip = rng.random((1, t, h, w, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(0), clip[:, :chunk + 2 * overlap], oh, ow
    )

    plain_fn = jax.jit(
        lambda x, a, b: model.apply(variables, x, a, b), static_argnums=(1, 2)
    )
    stream = StreamingVSR(plain_fn, oh, ow, chunk=chunk, overlap=overlap)
    want = []
    for i in range(t):
        want.extend(stream.push(clip[0, i]))
    want.extend(stream.flush())

    mesh = spatial_mesh(eight_devices, 8)
    flow_fn, sr_fn = make_flow_sr_fns(
        model, variables, oh, ow, mesh=mesh, max_disp=8
    )
    cached = FlowCachedStreamingVSR(
        flow_fn, sr_fn, oh, ow, chunk=chunk, overlap=overlap
    )
    got = []
    for i in range(t):
        got.extend(cached.push(clip[0, i]))
    got.extend(cached.flush())

    assert len(got) == len(want) == t
    np.testing.assert_allclose(
        np.stack(got), np.stack(want), atol=2e-5, rtol=1e-5
    )


def test_serve_cli(tmp_path, rng):
    from PIL import Image

    from mobilesuperresolution_tpu.cli import serve

    in_dir = tmp_path / "frames"
    in_dir.mkdir()
    t, h, w = 7, 16, 20
    for i in range(t):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(in_dir / f"{i:04d}.png")

    job = tmp_path / "job"
    serve.main([
        "--job_dir", str(job),
        "--input_dir", str(in_dir),
        "--model_type", "basic",
        "--scale", "2",
        "--height", str(h * 2),
        "--width", str(w * 2),
        "--chunk_frames", "2",
        "--chunk_overlap", "1",
    ])
    out = sorted(os.listdir(job / "serve"))
    assert len(out) == t
    first = np.asarray(Image.open(job / "serve" / out[0]))
    assert first.shape == (h * 2, w * 2, 3)


def test_serve_cli_multistream(tmp_path, rng):
    from PIL import Image

    from mobilesuperresolution_tpu.cli import serve

    t, h, w = 6, 16, 20
    dirs = []
    for s in range(2):
        d = tmp_path / f"frames{s}"
        d.mkdir()
        for i in range(t):
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:04d}.png")
        dirs.append(str(d))

    job = tmp_path / "job"
    serve.main([
        "--job_dir", str(job),
        "--input_dir", ",".join(dirs),
        "--model_type", "basic",
        "--scale", "2",
        "--height", str(h * 2),
        "--width", str(w * 2),
        "--chunk_frames", "2",
        "--chunk_overlap", "1",
    ])
    for s in range(2):
        out = sorted(os.listdir(job / "serve" / f"stream{s}"))
        assert len(out) == t
        first = np.asarray(Image.open(job / "serve" / f"stream{s}" / out[0]))
        assert first.shape == (h * 2, w * 2, 3)


def test_serve_cli_arrival_pacing(tmp_path, rng):
    """--arrival_fps paces input; all frames are still emitted and the
    stats record the pacing."""
    import json

    from PIL import Image

    from mobilesuperresolution_tpu.cli import serve

    in_dir = tmp_path / "frames"
    in_dir.mkdir()
    t, h, w = 5, 16, 20
    for i in range(t):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(in_dir / f"{i:04d}.png")

    job = tmp_path / "job"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        serve.main([
            "--job_dir", str(job),
            "--input_dir", str(in_dir),
            "--model_type", "basic",
            "--scale", "2",
            "--chunk_frames", "2",
            "--chunk_overlap", "1",
            "--arrival_fps", "50",
            "--no_save",
        ])
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["frames"] == t
    assert stats["arrival_fps"] == 50
    # output size defaulted to input x scale
    assert stats["out"] is None


# ---------------------------------------------------------------------------
# Flow-reuse streaming (serve/flow_cache.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_vsr_model():
    model = BasicVSR(num_feat=8, num_block=1, scale=2)
    x = jnp.zeros((1, 7, 16, 20, 3))
    variables = model.init(jax.random.key(0), x, 32, 40)
    return model, variables


def test_flow_cached_matches_chunked(tiny_vsr_model, rng):
    """Flow-reuse streaming == chunked_vsr_apply to float tolerance (the
    pair flows are the same VALUES; only the SpyNet batch grouping differs,
    so outputs agree to reduction-retiling ulp, not bitwise)."""
    from mobilesuperresolution_tpu.serve import (
        FlowCachedStreamingVSR,
        make_flow_sr_fns,
    )

    model, variables = tiny_vsr_model
    t, h, w = 17, 16, 20
    chunk, overlap = 3, 2
    clip = rng.random((1, t, h, w, 3)).astype(np.float32)

    apply_fn = jax.jit(
        lambda x, oh, ow: model.apply(variables, x, oh, ow),
        static_argnums=(1, 2),
    )
    want = np.asarray(
        chunked_vsr_apply(apply_fn, jnp.asarray(clip), 32, 40, chunk, overlap)
    )

    flow_fn, sr_fn = make_flow_sr_fns(model, variables, 32, 40)
    stream = FlowCachedStreamingVSR(
        flow_fn, sr_fn, 32, 40, chunk=chunk, overlap=overlap
    )
    stream.warmup((h, w, 3))
    got = []
    for i in range(t):
        got.extend(stream.push(clip[0, i]))
    got.extend(stream.flush())

    assert len(got) == t
    np.testing.assert_allclose(np.stack(got)[None], want, rtol=1e-5, atol=1e-5)


def test_flow_cached_computes_each_pair_once(tiny_vsr_model, rng,
                                             monkeypatch):
    """The point of the cache: no pair flow is ever computed twice, and the
    cache + frame buffer stay bounded by the window, not the stream."""
    from mobilesuperresolution_tpu.serve import (
        FlowCachedStreamingVSR,
        make_flow_sr_fns,
    )

    model, variables = tiny_vsr_model
    t, h, w = 23, 16, 20
    chunk, overlap = 3, 2
    clip = rng.random((t, h, w, 3)).astype(np.float32)

    flow_fn, sr_fn = make_flow_sr_fns(model, variables, 32, 40)
    stream = FlowCachedStreamingVSR(
        flow_fn, sr_fn, 32, 40, chunk=chunk, overlap=overlap
    )

    computed = []
    orig = FlowCachedStreamingVSR._ensure_flows

    def spying(self, pairs):
        new = []
        for k in pairs:
            if k not in self._pair_flows and k not in new:
                new.append(k)
        computed.extend(new)
        return orig(self, pairs)

    monkeypatch.setattr(FlowCachedStreamingVSR, "_ensure_flows", spying)

    max_cache = 0
    max_frames = 0
    n_out = 0
    for i in range(t):
        n_out += len(stream.push(clip[i]))
        max_cache = max(max_cache, len(stream._pair_flows))
        max_frames = max(max_frames, len(stream._frames))
    n_out += len(stream.flush())

    assert n_out == t
    # every needed pair computed exactly once
    assert len(computed) == len(set(computed))
    # interior pairs + clamped self-pairs at both clip edges
    assert set(computed) == (
        {(i, i + 1) for i in range(t - 1)} | {(0, 0), (t - 1, t - 1)}
    )
    # O(window) state, never O(stream)
    assert max_frames <= stream.window + chunk
    assert max_cache <= stream.window + 2 * chunk
    assert not stream._pair_flows  # flush() cleared it


def test_flow_cached_multistream_matches_solo(tiny_vsr_model, rng):
    """S lockstep streams through one flow-cached pipeline == each stream
    served alone (batch-independence, as for plain StreamingVSR)."""
    from mobilesuperresolution_tpu.serve import (
        FlowCachedStreamingVSR,
        make_flow_sr_fns,
    )

    model, variables = tiny_vsr_model
    t, h, w, s = 13, 16, 20, 2
    chunk, overlap = 3, 2
    clips = rng.random((s, t, h, w, 3)).astype(np.float32)

    flow_fn, sr_fn = make_flow_sr_fns(model, variables, 32, 40)

    solo = []
    for k in range(s):
        stream = FlowCachedStreamingVSR(
            flow_fn, sr_fn, 32, 40, chunk=chunk, overlap=overlap
        )
        got = []
        for i in range(t):
            got.extend(stream.push(clips[k, i]))
        got.extend(stream.flush())
        solo.append(np.stack(got))

    multi = FlowCachedStreamingVSR(
        flow_fn, sr_fn, 32, 40, chunk=chunk, overlap=overlap, num_streams=s
    )
    got = []
    for i in range(t):
        got.extend(multi.push(clips[:, i]))
    got.extend(multi.flush())
    batched = np.stack(got, axis=1)  # (S, T, OH, OW, C)

    np.testing.assert_allclose(batched, np.stack(solo), rtol=1e-5, atol=1e-5)


def test_make_flow_sr_fns_rejects_flowless_model():
    """mvvsr/naive_multi have no SpyNet — nothing to reuse; fail loud."""
    from mobilesuperresolution_tpu.serve import make_flow_sr_fns

    with pytest.raises(ValueError, match="SpyNet"):
        make_flow_sr_fns(
            BasicVSR(num_feat=8, num_block=1, scale=2),
            {"params": {"fusion": {}}},
            32,
            40,
        )


def test_serve_cli_flow_cache(tmp_path, rng):
    """--flow_cache serves the same frames as the plain path (uint8 outputs
    may differ by 1 LSB from the float-ulp flow-batching difference)."""
    from PIL import Image

    from mobilesuperresolution_tpu.cli import serve

    in_dir = tmp_path / "frames"
    in_dir.mkdir()
    t, h, w = 9, 16, 20
    for i in range(t):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(in_dir / f"{i:04d}.png")

    outs = {}
    for flag, name in [([], "plain"), (["--flow_cache"], "cached")]:
        job = tmp_path / f"job_{name}"
        serve.main([
            "--job_dir", str(job),
            "--input_dir", str(in_dir),
            "--model_type", "basic",
            "--scale", "2",
            "--height", str(h * 2),
            "--width", str(w * 2),
            "--chunk_frames", "2",
            "--chunk_overlap", "1",
            *flag,
        ])
        files = sorted(os.listdir(job / "serve"))
        assert len(files) == t
        outs[name] = np.stack(
            [np.asarray(Image.open(job / "serve" / f)) for f in files]
        ).astype(np.int16)

    assert np.abs(outs["plain"] - outs["cached"]).max() <= 1
