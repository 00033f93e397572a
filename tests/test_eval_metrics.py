"""Unit tests for the eval metric implementations (the reference ships no
eval-metric tests — SURVEY §4 item 5)."""

import numpy as np
import pytest

from multimodal_diffusion_tpu.eval.audio_quality import (
    logmel_l1, mcd, snr_like, spectral_convergence,
)
from multimodal_diffusion_tpu.eval.av_sync import (
    audio_rms_envelope, best_lag_and_corr, estimate_av_sync,
    video_motion_envelope,
)
from multimodal_diffusion_tpu.eval.video_metrics import (
    psnr, ssim, temporal_flicker,
)


# ---------------------------- audio metrics ----------------------------


def test_snr_identity_and_noise():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(8000).astype(np.float32)
    assert snr_like(y, y) > 90  # identical -> huge SNR
    noisy = y + 0.1 * rng.standard_normal(8000).astype(np.float32)
    snr = snr_like(y, noisy)
    assert 15 < snr < 25  # ~20 dB by construction


def test_spectral_convergence_identity():
    rng = np.random.default_rng(1)
    y = rng.standard_normal(8000).astype(np.float32)
    assert spectral_convergence(y, y, sr=8000) < 1e-6
    assert spectral_convergence(y, np.zeros_like(y), sr=8000) == pytest.approx(
        1.0, abs=1e-5)


def test_logmel_l1_orders_degradation():
    rng = np.random.default_rng(2)
    y = np.sin(np.linspace(0, 400, 8000)).astype(np.float32)
    small = logmel_l1(y, y + 0.01 * rng.standard_normal(8000).astype(np.float32), 8000)
    large = logmel_l1(y, rng.standard_normal(8000).astype(np.float32), 8000)
    assert 0 <= small < large


def test_mcd_identity_zero():
    y = np.sin(np.linspace(0, 200, 8000)).astype(np.float32)
    assert mcd(y, y, sr=8000, use_dtw=False) < 1e-2
    assert mcd(y, y, sr=8000, use_dtw=True) < 1e-2


# ---------------------------- video metrics ----------------------------


def test_psnr_known_value():
    a = np.zeros((8, 8, 3), np.float64)
    b = np.full((8, 8, 3), 0.1, np.float64)
    # MSE = 0.01 -> PSNR = 10*log10(1/0.01) = 20 dB
    assert psnr(a, b) == pytest.approx(20.0, abs=1e-6)
    assert psnr(a, a) == float("inf")


def test_ssim_bounds():
    rng = np.random.default_rng(3)
    a = rng.random((32, 32, 3))
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    b = rng.random((32, 32, 3))
    s = ssim(a, b)
    assert -1.0 <= s < 0.5  # unrelated noise images have low SSIM


def test_temporal_flicker():
    stable = np.zeros((5, 8, 8, 3), np.uint8)
    assert temporal_flicker(stable) == 0.0
    flicker = np.zeros((4, 8, 8, 3), np.uint8)
    flicker[1::2] = 255
    assert temporal_flicker(flicker) == pytest.approx(1.0, abs=1e-6)


# ---------------------------- AV sync ----------------------------


def test_best_lag_recovers_shift():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(200).astype(np.float32)
    shift = 5
    y = np.roll(x, shift)  # y delayed by `shift`
    lag, corr = best_lag_and_corr(x, y, max_lag=10)
    assert lag == shift and corr > 0.8


def test_av_sync_on_correlated_envelopes():
    """Video brightness pulses synchronized with audio bursts -> near-zero
    lag and positive correlation."""
    fps, sr, secs = 8, 800, 4
    T = fps * secs
    rng = np.random.default_rng(5)
    frames = np.zeros((T, 16, 16, 3), np.uint8)
    wav = np.zeros(sr * secs, np.float32)
    for t in range(0, T, 8):  # a pulse every second
        frames[t] = 255
        a = t * sr // fps
        wav[a : a + sr // fps] = rng.standard_normal(sr // fps) * 0.8
    lag_s, corr = estimate_av_sync(frames, wav, sr=sr, fps=fps,
                                   max_lag_seconds=1.0)
    assert abs(lag_s) <= 2.0 / fps  # within two frames
    assert corr > 0.3

    v_env = video_motion_envelope(frames)
    a_env = audio_rms_envelope(wav, sr, fps)
    assert v_env.shape[0] == T and a_env.shape[0] == T
    assert abs(float(v_env.mean())) < 1e-5  # z-scored


def test_best_lag_and_corr_matches_bruteforce_loop():
    """The vectorized xcorr must reproduce a per-lag brute-force loop
    (the reference's algorithm, av_sync.py:164-192) across random inputs,
    shifts, length mismatches, and max_lag > len edge cases."""

    def brute(x, y, max_lag):
        L = min(len(x), len(y))
        x = x[:L] - x[:L].mean()
        y = y[:L] - y[:L].mean()
        x_std = x.std() + 1e-8
        y_std = y.std() + 1e-8
        best_corr, best_lag = -1.0, 0
        for lag in range(-max_lag, max_lag + 1):
            if lag < 0:
                xs, ys = x[-lag:L], y[: L + lag]
            elif lag > 0:
                xs, ys = x[: L - lag], y[lag:L]
            else:
                xs, ys = x, y
            if len(xs) < 3:
                continue
            corr = float(np.dot(xs, ys) / ((len(xs) - 1) * x_std * y_std))
            if corr > best_corr:
                best_corr, best_lag = corr, lag
        return best_lag, best_corr

    rng = np.random.default_rng(11)
    cases = []
    for n in (7, 40, 128):
        for m in (n, n + 9):
            # the reference loop itself crashes for max_lag >= L (negative
            # python-slice wraparound), so equivalence only covers < L
            for max_lag in (0, 3, n - 2):
                x = rng.standard_normal(n).astype(np.float32)
                y = rng.standard_normal(m).astype(np.float32)
                cases.append((x, y, max_lag))
    # plus genuinely shifted signals
    base = rng.standard_normal(100).astype(np.float32)
    cases.append((base, np.roll(base, 7), 12))
    cases.append((np.roll(base, 7), base, 12))

    for x, y, max_lag in cases:
        lag_v, corr_v = best_lag_and_corr(x, y, max_lag)
        lag_b, corr_b = brute(x, y, max_lag)
        assert lag_v == lag_b, (len(x), len(y), max_lag)
        assert corr_v == pytest.approx(corr_b, rel=1e-5, abs=1e-6)

    # max_lag beyond the signal length: out-of-range lags are inadmissible
    # (overlap < 3) rather than crashing like the reference loop does
    x = rng.standard_normal(8).astype(np.float32)
    lag, corr = best_lag_and_corr(x, np.roll(x, 2), max_lag=50)
    assert abs(lag) <= 7


def test_uniform_filter_matches_scipy():
    scipy = pytest.importorskip("scipy.ndimage")
    from multimodal_diffusion_tpu.eval.video_metrics import _uniform_filter2d

    rng = np.random.default_rng(12)
    for size in (3, 7, 11):
        x = rng.standard_normal((24, 17))
        ours = _uniform_filter2d(x, size)
        ref = scipy.uniform_filter(x, size=size, mode="reflect")
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


def test_eval_report_emits_gen_and_real_gap_keys():
    """Regression: gap{suf}_gen keys were silently dropped because the
    generated-audio shuffle rows carry no _gen infix (tools/eval_av_quality
    stores av_sync_corr{suf}_shuf, not ..._gen_shuf)."""
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "eval_av_quality",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools" / "eval_av_quality.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    rows = []
    for _ in range(8):
        row = {"logmel_l1": float(rng.uniform(2, 3)),
               "logmel_l1_shuf": float(rng.uniform(2, 3))}
        for suf in ("", "0"):
            row[f"av_sync_corr{suf}_gen"] = float(rng.uniform(-1, 1))
            row[f"av_sync_corr{suf}_real"] = float(rng.uniform(-1, 1))
            row[f"av_sync_corr{suf}_shuf"] = float(rng.uniform(-1, 1))
            row[f"av_sync_corr{suf}_real_shuf"] = float(rng.uniform(-1, 1))
        rows.append(row)

    rep = mod.build_report(rows, ["", "0"])
    for suf in ("", "0"):
        for who in ("gen", "real"):
            assert f"gap{suf}_{who}" in rep and f"gap{suf}_{who}_t" in rep
    # gap values equal the mean paired difference against the right anchor
    exp = np.mean([r["av_sync_corr0_gen"] - r["av_sync_corr0_shuf"]
                   for r in rows])
    assert abs(rep["gap0_gen"] - exp) < 1e-12
    assert "gap_logmel" in rep and rep["n_clips"] == 8


def _load_eval_tool():
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "eval_av_quality",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools" / "eval_av_quality.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_env_corr0_separates_matched_from_shuffled():
    """Audio<->audio envelope timing instrument: a waveform whose loudness
    envelope matches the target's scores ~1.0 at zero lag regardless of
    carrier content; a time-shifted envelope scores clearly lower.  This is
    the property the motion-envelope proxy lacks on GRID (real-audio anchor
    gaps of only +0.03..0.07, PERFORMANCE.md)."""
    mod = _load_eval_tool()
    sr = 16000
    t = np.arange(3 * sr) / sr
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t)          # 1.7 Hz AM
    own = np.sin(2 * np.pi * 220 * t) * env                  # same envelope,
    gen = np.random.default_rng(0).normal(size=t.size) * env  # any carrier
    shifted = np.roll(own, int(0.29 * sr))                   # ~0.3 s off

    c_own = mod.env_corr0(gen, own, sr)
    c_shift = mod.env_corr0(gen, shifted, sr)
    assert c_own > 0.95
    assert c_own - c_shift > 0.5


def test_eval_report_emits_env_gap_keys():
    mod = _load_eval_tool()
    rng = np.random.default_rng(1)
    rows = []
    for _ in range(6):
        rows.append({
            "logmel_l1": float(rng.uniform(2, 3)),
            "logmel_l1_shuf": float(rng.uniform(2, 3)),
            "env_corr_gen": float(rng.uniform(-1, 1)),
            "env_corr_shuf": float(rng.uniform(-1, 1)),
            "env_corr_real_shuf": float(rng.uniform(-1, 1)),
        })
    rep = mod.build_report(rows, [])
    assert "gap_env" in rep and "gap_env_t" in rep
    exp = np.mean([r["env_corr_gen"] - r["env_corr_shuf"] for r in rows])
    assert abs(rep["gap_env"] - exp) < 1e-12


def test_spec_breakdown_splits_by_speaker(tmp_path, capsys):
    """tools/spec_breakdown.py: per-speaker paired-gap split via
    _manifest_index against a synthetic manifest + eval JSON."""
    import importlib.util
    import json
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "spec_breakdown",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools" / "spec_breakdown.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    clips = []
    for spk in ("frames_val", "frames_s2"):
        for i in range(3):
            clips.append({"video_frames_dir":
                          f"data/video/{spk}/vid{i}/clips/clip_0000"})
    manifest = tmp_path / "m.json"
    manifest.write_text(json.dumps({"clips": clips}))

    rows = []
    for i in range(6):
        # speaker 1 (first 3 rows): strong positive env gap; speaker 2: zero
        gap = 0.5 if i < 3 else 0.0
        rows.append({"_manifest_index": i,
                     "env_corr_gen": 0.2 + gap + 0.01 * i,
                     "env_corr_shuf": 0.2,
                     "logmel_l1": 2.0, "logmel_l1_shuf": 2.0})
    ev = tmp_path / "e.json"
    ev.write_text(json.dumps({"mean": {}, "per_clip": rows}))

    mod.main([str(ev), "--manifest", str(manifest), "--keys", "gap_env"])
    out = capsys.readouterr().out
    lines = {ln.split()[0]: ln for ln in out.strip().splitlines()[1:]}
    assert set(lines) == {"s1", "s2", "ALL"}
    assert "+0.5" in lines["s1"] and "+0.0" in lines["s2"]
