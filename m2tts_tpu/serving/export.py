"""Deployable serving artifacts: StableHLO-exported synthesis graphs.

``export_synthesizer`` serializes the serving pipeline's compiled
graphs (`jax.export` → versioned StableHLO with compatibility
guarantees) plus the weights and a JSON manifest into one directory;
``ExportedSynthesizer`` loads that directory and synthesizes WITHOUT the
model's Python code — only the host-side text frontend and the JAX
runtime. This is the TPU-native analog of the torch ecosystem's
TorchScript/ONNX deployment artifacts; the reference ships nothing
comparable (its only inference surface re-instantiates the Python model
per run, reference scripts/synthesize.py:91-161).

Artifact layout::

    manifest.json             buckets, dtypes, rates, file index
    params.npz                weights, '/'-joined tree paths as keys
    graphs/synth_b{B}_t{T}_f{F}.shlo   [B,T+1]i32 packed ids+lengths,
                                       f32 scale → int16 PCM + frames
    graphs/probe_b{B}_t{T}.shlo        total-frame probe per (B,T)

The exported graphs use the pure-XLA vocoder: Mosaic (Pallas) custom
calls would pin the artifact to a TPU runtime inside the kernels'
compatibility window, while the XLA module is portable across every
platform the export targets (the kernels remain a serving-time
optimization of the SAME math — equivalence-tested in
tests/test_vocoder_backends.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np

MANIFEST_NAME = "manifest.json"
ARTIFACT_VERSION = 1


def _flatten(tree: Dict, prefix: str = "") -> Iterator[Tuple[str, np.ndarray]]:
    for k in sorted(tree):
        v = tree[k]
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, np.asarray(v)


def _unflatten(pairs) -> Dict:
    root: Dict = {}
    for key, v in pairs:
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def export_synthesizer(synth, out_dir: Union[str, Path],
                       full: bool = False,
                       platforms: Optional[Sequence[str]] = None) -> Dict:
    """Write a deployable artifact for ``synth`` to ``out_dir``.

    ``full=False`` exports the single-stream path (smallest batch bucket
    × every text/frame bucket); ``full=True`` exports every reachable
    (batch, text, frame) combination. ``platforms`` (e.g.
    ``("tpu", "cpu")``) requests multi-platform lowering; default is the
    exporting host's platform. Returns the manifest dict."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from m2tts_tpu.serving.pipeline import Synthesizer

    # portable graph: force the pure-XLA vocoder module (see module doc)
    xla = synth
    if synth.vocoder_backend != "xla":
        xla = Synthesizer(synth.model, synth.params,
                          text_buckets=synth.text_buckets,
                          frame_buckets=synth.frame_buckets,
                          batch_buckets=synth.batch_buckets,
                          sample_rate=synth.sample_rate,
                          vocoder_backend="xla",
                          compute_dtype=synth.compute_dtype)

    out = Path(out_dir)
    (out / "graphs").mkdir(parents=True, exist_ok=True)
    params_host = jax.device_get(synth.params)
    np.savez(out / "params.npz", **dict(_flatten(params_host)))
    pspec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params_host)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    scale_spec = jax.ShapeDtypeStruct((), jnp.float32)

    graphs: List[Dict] = []
    probes: List[Dict] = []
    seen_bt = set()
    for b, t, f in xla.reachable_shapes(full):
        packed_spec = jax.ShapeDtypeStruct((b, t + 1), jnp.int32)
        exp = jexport.export(xla._get_synth(f, False), **kw)(
            pspec, packed_spec, scale_spec)
        name = f"graphs/synth_b{b}_t{t}_f{f}.shlo"
        (out / name).write_bytes(exp.serialize())
        graphs.append({"batch": b, "text": t, "frames": f, "file": name})
        if (b, t) not in seen_bt:
            seen_bt.add((b, t))
            expp = jexport.export(xla._get_probe(), **kw)(
                pspec, packed_spec, scale_spec)
            pname = f"graphs/probe_b{b}_t{t}.shlo"
            (out / pname).write_bytes(expp.serialize())
            probes.append({"batch": b, "text": t, "file": pname})

    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "platforms": list(platforms) if platforms else
                     [jax.default_backend()],
        "sample_rate": synth.sample_rate,
        "upsample": synth.upsample,
        "compute_dtype": synth.compute_dtype,
        "text_buckets": list(xla.text_buckets),
        "frame_buckets": list(xla.frame_buckets),
        "batch_buckets": sorted({g["batch"] for g in graphs}),
        "params_file": "params.npz",
        # the artifact must pronounce exactly like the synthesizer it was
        # exported from: custom lexicon entries travel in the manifest
        "extra_lexicon": {k: list(v)
                          for k, v in synth.extra_lexicon.items()},
        "graphs": graphs,
        "probes": probes,
    }
    (out / MANIFEST_NAME).write_text(json.dumps(manifest, indent=1))
    return manifest


class ExportedSynthesizer:
    """Run synthesis from an exported artifact directory.

    Needs only the artifact, the text frontend
    (`m2tts_tpu.frontend.text` — host-side, model-free) and the JAX
    runtime; none of the model code is touched. Mirrors the
    Synthesizer's host logic: bucket selection, duration probe, packed
    ids+lengths transfer, per-utterance PCM trim."""

    def __init__(self, path: Union[str, Path]):
        from m2tts_tpu.frontend.text import TextProcessor

        self.dir = Path(path)
        self.manifest = json.loads((self.dir / MANIFEST_NAME).read_text())
        with np.load(self.dir / self.manifest["params_file"]) as z:
            self.params = _unflatten((k, z[k]) for k in z.files)
        self.sample_rate = int(self.manifest["sample_rate"])
        self.upsample = int(self.manifest["upsample"])
        self.text_buckets = tuple(self.manifest["text_buckets"])
        self.frame_buckets = tuple(self.manifest["frame_buckets"])
        self.batch_buckets = tuple(self.manifest["batch_buckets"])
        self.text_processor = TextProcessor(
            extra_lexicon=self.manifest.get("extra_lexicon") or None)
        self._graphs = {(g["batch"], g["text"], g["frames"]): g["file"]
                        for g in self.manifest["graphs"]}
        self._probes = {(p["batch"], p["text"]): p["file"]
                        for p in self.manifest["probes"]}
        self._loaded: Dict[str, object] = {}

    def _call(self, file: str, packed: np.ndarray, scale: float):
        from jax import export as jexport

        if file not in self._loaded:
            self._loaded[file] = jexport.deserialize(
                (self.dir / file).read_bytes())
        return self._loaded[file].call(self.params, packed,
                                       np.float32(scale))

    def synthesize_batch(self, texts: List[str],
                         duration_scale: float = 1.0
                         ) -> List[Dict[str, np.ndarray]]:
        # the SAME host-side encoding/bucketing the graphs were traced
        # against — shared code, so the convention cannot desynchronize
        from m2tts_tpu.serving.pipeline import (_bucket_for,
                                                encode_packed_batch)

        packed = encode_packed_batch(self.text_processor, texts,
                                     self.batch_buckets, self.text_buckets)
        b, t = packed.shape[0], packed.shape[1] - 1
        totals = np.asarray(self._call(self._probes[(b, t)], packed,
                                       duration_scale))
        frames = _bucket_for(int(totals[: len(texts)].max()),
                             self.frame_buckets)
        out = self._call(self._graphs[(b, t, frames)], packed,
                         duration_scale)
        # ONE blocking fetch for the whole output dict (a standalone
        # transfer costs ~30 ms on tunneled hosts; mirrors
        # pipeline._collect)
        import jax

        host = jax.device_get(out)
        pcm, tf = host["pcm"], host["total_frames"]
        results = []
        for i in range(len(texts)):
            n_frames = int(min(tf[i], frames))
            audio_pcm = pcm[i, : n_frames * self.upsample]
            results.append({
                "audio_pcm": audio_pcm,
                "audio": audio_pcm.astype(np.float32) / 32767.0,
                "frames": n_frames,
            })
        return results

    def synthesize(self, text: str, duration_scale: float = 1.0
                   ) -> Dict[str, np.ndarray]:
        return self.synthesize_batch([text], duration_scale)[0]
