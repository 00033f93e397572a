"""Pre-decoded sharded clip records — the production input path.

JPEG decode capped real AV training at ~2-6 clips/s/core on the dev host vs
a ~70 clips/s jitted step (round-1 measurement, PERFORMANCE.md); the fix is
to decode ONCE offline into fixed-shape binary shards that training reads
with `np.memmap` (zero-copy, page-cache friendly, no codec work in the hot
loop).  `tools/build_records.py` converts a clips.json manifest tree into
shards using the native C++ decoder.

Shard layout (`.avrec`):

    [0:8)      magic b"AVREC\\x01\\0\\0"
    [8:4096)   JSON header, zero-padded: {"n", "video_shape", "video_dtype",
               "audio_shape", "audio_dtype", "fps", "sr"}
    [4096:...) flags:  n bytes   (bit0 = has_video, bit1 = has_audio)
    [...]      records: n x (video_bytes + audio_bytes), fixed sizes

Records have STATIC shapes by construction — exactly what the jitted train
step needs; collate is a stack.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

MAGIC = b"AVREC\x01\x00\x00"
HEADER_BYTES = 4096


class RecordShardWriter:
    """Streaming writer for one `.avrec` shard."""

    def __init__(self, path, video_shape: Sequence[int],
                 audio_shape: Sequence[int], video_dtype="uint8",
                 audio_dtype="float32", fps: int = 16, sr: int = 16000):
        self.path = Path(path)
        self.video_shape = tuple(int(x) for x in video_shape)
        self.audio_shape = tuple(int(x) for x in audio_shape)
        self.video_dtype = np.dtype(video_dtype)
        self.audio_dtype = np.dtype(audio_dtype)
        self.fps, self.sr = int(fps), int(sr)
        self._flags: List[int] = []
        self._payload = self.path.with_suffix(".avrec.tmp")
        self._f = open(self._payload, "wb")

    def add(self, video: Optional[np.ndarray], audio: Optional[np.ndarray]):
        flag = 0
        if video is not None:
            v = np.ascontiguousarray(video, dtype=self.video_dtype)
            assert v.shape == self.video_shape, (v.shape, self.video_shape)
            flag |= 1
        else:
            v = np.zeros(self.video_shape, self.video_dtype)
        if audio is not None:
            a = np.ascontiguousarray(audio, dtype=self.audio_dtype)
            assert a.shape == self.audio_shape, (a.shape, self.audio_shape)
            flag |= 2
        else:
            a = np.zeros(self.audio_shape, self.audio_dtype)
        self._f.write(v.tobytes())
        self._f.write(a.tobytes())
        self._flags.append(flag)

    def close(self):
        self._f.close()
        n = len(self._flags)
        header = {
            "n": n,
            "video_shape": list(self.video_shape),
            "video_dtype": self.video_dtype.name,
            "audio_shape": list(self.audio_shape),
            "audio_dtype": self.audio_dtype.name,
            "fps": self.fps,
            "sr": self.sr,
        }
        hb = json.dumps(header).encode()
        assert len(hb) < HEADER_BYTES - len(MAGIC), "header too large"
        with open(self.path, "wb") as out:
            out.write(MAGIC)
            out.write(hb)
            out.write(b"\x00" * (HEADER_BYTES - len(MAGIC) - len(hb)))
            out.write(bytes(self._flags))
            with open(self._payload, "rb") as src:
                while True:
                    chunk = src.read(1 << 22)
                    if not chunk:
                        break
                    out.write(chunk)
        self._payload.unlink()
        return n


def write_record_shards(
    items: Iterable[Dict[str, np.ndarray]],
    out_dir,
    video_shape: Sequence[int],
    audio_shape: Sequence[int],
    clips_per_shard: int = 256,
    **meta,
) -> List[Path]:
    """items yield {"video": arr|None, "audio": arr|None}; returns shard
    paths `shard_00000.avrec`, ..."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths: List[Path] = []
    writer = None
    count = 0
    for it in items:
        if writer is None:
            p = out_dir / f"shard_{len(paths):05d}.avrec"
            writer = RecordShardWriter(p, video_shape, audio_shape, **meta)
            paths.append(p)
        writer.add(it.get("video"), it.get("audio"))
        count += 1
        if count >= clips_per_shard:
            writer.close()
            writer, count = None, 0
    if writer is not None:
        writer.close()
    return paths


class _Shard:
    def __init__(self, path: Path):
        self.path = path
        with open(path, "rb") as f:
            head = f.read(HEADER_BYTES)
        if head[: len(MAGIC)] != MAGIC:
            raise ValueError(f"{path}: not an AVREC shard")
        self.meta = json.loads(
            head[len(MAGIC):].split(b"\x00", 1)[0].decode()
        )
        self.n = int(self.meta["n"])
        self.video_shape = tuple(self.meta["video_shape"])
        self.audio_shape = tuple(self.meta["audio_shape"])
        self.video_dtype = np.dtype(self.meta["video_dtype"])
        self.audio_dtype = np.dtype(self.meta["audio_dtype"])
        self.v_bytes = int(np.prod(self.video_shape)) * self.video_dtype.itemsize
        self.a_bytes = int(np.prod(self.audio_shape)) * self.audio_dtype.itemsize
        self.rec_bytes = self.v_bytes + self.a_bytes
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        self.flags = np.asarray(self._mm[HEADER_BYTES : HEADER_BYTES + self.n])
        self.data_off = HEADER_BYTES + self.n

    def record(self, i: int) -> Tuple[np.ndarray, np.ndarray, int]:
        off = self.data_off + i * self.rec_bytes
        vbuf = self._mm[off : off + self.v_bytes]
        abuf = self._mm[off + self.v_bytes : off + self.rec_bytes]
        video = np.frombuffer(vbuf, self.video_dtype).reshape(self.video_shape)
        audio = np.frombuffer(abuf, self.audio_dtype).reshape(self.audio_shape)
        return video, audio, int(self.flags[i])


class RecordDataset:
    """mmap-backed dataset over a directory (or glob) of `.avrec` shards.

    Yields the same item dict as AVManifestDataset so collate_batch works
    unchanged; `device_preprocess` keeps frames uint8 [T, H, W, 3] for the
    on-device normalize path, else converts to float32 [3, T, H, W]."""

    def __init__(self, records, device_preprocess: bool = True):
        records = Path(records)
        if records.is_dir():
            shard_paths = sorted(records.glob("*.avrec"))
        else:
            import glob as _glob

            shard_paths = [Path(p) for p in sorted(_glob.glob(str(records)))]
        if not shard_paths:
            raise FileNotFoundError(f"no .avrec shards under {records}")
        self.shards = [_Shard(p) for p in shard_paths]
        m0 = self.shards[0].meta
        for s in self.shards[1:]:
            if (s.video_shape != self.shards[0].video_shape
                    or s.audio_shape != self.shards[0].audio_shape):
                raise ValueError("inconsistent record shapes across shards")
        self.device_preprocess = bool(device_preprocess)
        self.fps = int(m0.get("fps", 16))
        self.sr = int(m0.get("sr", 16000))
        self._offsets = np.cumsum([0] + [s.n for s in self.shards])
        # [T, H, W, 3] stored layout
        self.T = self.shards[0].video_shape[0]
        self.L = int(np.prod(self.shards[0].audio_shape))

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int) -> Dict:
        si = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        video, audio, flag = self.shards[si].record(idx - self._offsets[si])
        if self.device_preprocess:
            v = video  # uint8 [T, H, W, 3], zero-copy view
        else:
            v = np.transpose(
                video.astype(np.float32) / 255.0, (3, 0, 1, 2)
            )  # [3, T, H, W]
        return {
            "video": v if (flag & 1) else None,
            "audio": audio.reshape(1, -1) if (flag & 2) else None,
            "fps": self.fps,
            "sr": self.sr,
        }


def device_resident_batches(dataset: "RecordDataset", mesh, batch_size: int,
                            seed: int = 0, shuffle: bool = True,
                            max_clips: int | None = None):
    """Zero-per-step-host-transfer input: upload ALL records to HBM once,
    then gather each batch on-device by index.

    On a tunneled/remote chip the per-step host->device batch transfer is
    the training bottleneck (measured 2.9 clips/s fed from host vs a 56
    clips/s jitted step at mvp scale — ~20 MB/step through the tunnel);
    a GRID-scale corpus (400 clips = ~1 GB uint8) fits in one chip's 16 GB
    HBM many times over, so the TPU-native answer is residency: one upload,
    then an on-device `take` per step.  Batches yield as sharded jax arrays;
    `parallel.sharding.shard_batch` passes them through untouched.

    Single-host only: arrays are device_put fully replicated over the mesh
    from this process's records, and the index stream is global (no
    shard_id/num_shards split like the DataLoader path) — under
    jax.process_count() > 1 every process would gather identical global
    indices over different local data, so this generator asserts
    single-process and multi-host jobs must use the loader path.

    `max_clips` caps how many records go resident (evenly strided over the
    record order, which preserves speaker balance for speaker-grouped
    corpora): the corpus + fp32 optimizer state of a large model must
    *together* fit in one chip's HBM, and at d=1024/16L the full 3872-clip
    GRID corpus (9.9 GB) plus ~3.4 GB of params/Adam/EMA overruns a 16 GB
    chip (observed RESOURCE_EXHAUSTED on the first train step).

    Yields {"video": uint8 [B, T, H, W, 3] | fp32, "audio": [B, 1, L],
    "has_video"/"has_audio": [B] float32} with the leading axis sharded
    over the mesh's 'data' axis.
    """
    import jax
    import jax.numpy as jnp

    from ..parallel.sharding import batch_sharding

    if jax.process_count() > 1:
        raise NotImplementedError(
            "device_resident_batches is single-host (replicated corpus + "
            "global index stream); use the DataLoader path for multi-host "
            "training")
    n = len(dataset)
    if batch_size > n:
        # fail loudly up front: a short gather batch would otherwise surface
        # as an opaque XLA shape mismatch deep inside the jitted train step
        raise ValueError(
            f"batch_size {batch_size} exceeds record count {n}; shrink the "
            f"batch or add records")
    sel = None
    if max_clips is not None and 0 < max_clips < n:
        sel = np.unique(
            np.linspace(0, n - 1, int(max_clips)).round().astype(np.int64))
        print(f"[resident] capping corpus {n} -> {sel.size} clips "
              f"(evenly strided)", flush=True)
    v_parts, a_parts, flags = [], [], []
    base = 0
    for s in dataset.shards:
        mm = s._mm
        body = mm[s.data_off : s.data_off + s.n * s.rec_bytes]
        recs = np.frombuffer(body, np.uint8).reshape(s.n, s.rec_bytes)
        fl = s.flags
        if sel is not None:
            loc = sel[(sel >= base) & (sel < base + s.n)] - base
            base += s.n
            if loc.size == 0:
                continue
            recs = recs[loc]          # row-gather copy of just this shard
            fl = np.asarray(s.flags)[loc]
        else:
            base += s.n
        n_s = recs.shape[0]
        v = recs[:, : s.v_bytes]
        a = recs[:, s.v_bytes :]
        v_parts.append(
            np.frombuffer(v.tobytes(), s.video_dtype).reshape(
                (n_s,) + s.video_shape))
        a_parts.append(
            np.frombuffer(a.tobytes(), s.audio_dtype).reshape(
                (n_s,) + s.audio_shape))
        flags.append(fl)
    video_all = np.concatenate(v_parts)   # [n, T, H, W, 3] uint8
    n = video_all.shape[0]
    if batch_size > n:
        raise ValueError(
            f"batch_size {batch_size} exceeds capped record count {n}; "
            f"raise data.resident_max_clips")
    audio_all = np.concatenate(a_parts).reshape(n, 1, -1)
    flag_all = np.concatenate(flags)
    has_v = (flag_all & 1).astype(np.float32)
    has_a = ((flag_all >> 1) & 1).astype(np.float32)

    if not dataset.device_preprocess:
        video_all = (video_all.astype(np.float32) / 255.0).transpose(
            0, 4, 1, 2, 3)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def put_chunked(arr, chunk_bytes=64 << 20, label="corpus"):
        """device_put in <=64 MB pieces: one giant transfer intermittently
        wedges the tunneled-chip link (observed on a ~1 GB upload); smaller
        messages also give us per-chunk completion points.

        Chunks are written into ONE preallocated device buffer via donated
        dynamic_update_slice calls, so peak device memory is |arr| + one
        chunk.  (Concatenating per-chunk device arrays — the previous
        scheme — transiently needs 2x|arr|, which for a multi-GB corpus
        exceeds a 16 GB chip's HBM and wedged a 9.9 GB upload.)"""
        import time as _time

        per_item = int(np.prod(arr.shape[1:])) * arr.dtype.itemsize
        step = max(1, chunk_bytes // max(1, per_item))
        if arr.shape[0] <= step:
            out = jax.device_put(arr, rep)
            jax.block_until_ready(out)
            return out
        buf = jax.jit(
            lambda: jnp.zeros(arr.shape, arr.dtype), out_shardings=rep
        )()
        upd = jax.jit(
            lambda b, c, lo: jax.lax.dynamic_update_slice_in_dim(b, c, lo, 0),
            donate_argnums=0, out_shardings=rep,
        )
        total_mb = arr.shape[0] * per_item / 1e6
        t0, sent, last_log = _time.time(), 0.0, 0.0
        for lo in range(0, arr.shape[0], step):
            chunk = np.ascontiguousarray(arr[lo : lo + step])
            buf = upd(buf, chunk, jnp.int32(lo))
            jax.block_until_ready(buf)
            sent += chunk.shape[0] * per_item / 1e6
            if sent - last_log >= 1000.0 or sent >= total_mb:
                dt = _time.time() - t0
                print(f"[resident] {label}: {sent:.0f}/{total_mb:.0f} MB "
                      f"({sent / max(dt, 1e-9):.0f} MB/s)", flush=True)
                last_log = sent
        return buf

    vd = put_chunked(video_all, label="video")
    ad = put_chunked(audio_all, label="audio")
    hv = jax.device_put(has_v, rep)
    ha = jax.device_put(has_a, rep)
    jax.block_until_ready((vd, ad, hv, ha))

    out_shardings = {
        "video": batch_sharding(mesh, video_all.ndim),
        "audio": batch_sharding(mesh, audio_all.ndim),
        "has_video": batch_sharding(mesh, 1),
        "has_audio": batch_sharding(mesh, 1),
    }

    @functools.partial(jax.jit, out_shardings=out_shardings)
    def gather(vd, ad, hv, ha, idx):
        return {
            "video": jnp.take(vd, idx, axis=0),
            "audio": jnp.take(ad, idx, axis=0),
            "has_video": jnp.take(hv, idx, axis=0),
            "has_audio": jnp.take(ha, idx, axis=0),
        }

    rng = np.random.default_rng(seed)
    order = np.arange(n)
    pos = n  # trigger reshuffle on first use
    while True:
        if shuffle:
            if pos + batch_size > n:
                rng.shuffle(order)
                pos = 0
            idx = order[pos : pos + batch_size]
            pos += batch_size
        else:
            # drop the partial tail (same epoch semantics as the shuffle
            # path and the DataLoader's drop_last=True) instead of wrapping
            # epoch end and start into one batch
            if pos + batch_size > n:
                pos = 0
            idx = np.arange(pos, pos + batch_size)
            pos += batch_size
        yield gather(vd, ad, hv, ha, jnp.asarray(idx, jnp.int32))
