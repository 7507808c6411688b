"""Self-describing Orbax checkpoints with rotation and resume.

TPU-native replacement for the reference's torch.save dicts (reference
training/train.py:240-288): each checkpoint stores the train-state pytree
plus the full config as JSON, so a checkpoint alone is enough to rebuild
the model (the property scripts/synthesize.py relies on, mirroring
reference scripts/synthesize.py:29-48). Rotation keeps the newest N
(reference train.py:263-268); `latest_step` powers `--resume`/make-resume
style workflows.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import orbax.checkpoint as ocp

from m2tts_tpu.utils.config import Config


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager: state pytree + config JSON."""

    def __init__(self, directory: Union[str, Path], max_to_keep: int = 5,
                 best_fn=None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=best_fn,
            enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, config: Optional[Config] = None,
             metrics: Optional[Dict[str, float]] = None) -> None:
        args: Dict[str, Any] = {"state": ocp.args.StandardSave(state)}
        if config is not None:
            cfg_dict = config.to_dict() if isinstance(config, Config) else dict(config)
            args["config"] = ocp.args.JsonSave(cfg_dict)
        self._mgr.save(step, args=ocp.args.Composite(**args), metrics=metrics)
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                state_template: Any = None) -> Tuple[Any, Optional[Config], int]:
        """Restore (state, config, step). `state_template` gives the pytree
        structure/shapes (abstract or concrete); without it, orbax restores
        raw arrays."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"No checkpoints in {self.directory}")
        items = {"state": (ocp.args.StandardRestore(state_template)
                           if state_template is not None
                           else ocp.args.StandardRestore())}
        if (self.directory / str(step) / "config").exists():
            items["config"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**items))
        config = Config(restored["config"]) if "config" in items else None
        return restored["state"], config, step

    def state_keys(self, step: Optional[int] = None) -> Optional[list]:
        """Top-level keys of the stored state pytree, from checkpoint
        metadata only (no array reads) — lets callers adapt their restore
        template to what a checkpoint actually contains (e.g. resuming a
        pre-EMA checkpoint with EMA newly enabled) instead of retrying on
        arbitrary restore exceptions. None when metadata is unreadable."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        try:
            meta = self._mgr.item_metadata(step)
            tree = meta["state"] if "state" in meta else meta.state
            return list(tree.keys()) if isinstance(tree, dict) else None
        except Exception:
            return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def close(self) -> None:
        self._mgr.close()


def load_for_inference(directory: Union[str, Path],
                       step: Union[int, str, None] = None
                       ) -> Tuple[Any, Config, int]:
    """Checkpoint dir → (params, config, step) for synthesis.

    Accepts checkpoints written by either trainer; extracts the generator
    params subtree regardless of train-state layout. ``step="best"``
    loads the best-validation checkpoint the trainers pin under
    ``<dir>/best`` (the reference's ``best_model.pt``,
    reference training/train.py:256-260, train_stage2.py:405-408).
    """
    directory = Path(directory)
    if step == "best":
        best_dir = directory / "best"
        if not best_dir.exists():
            raise FileNotFoundError(
                f"No best-checkpoint dir at {best_dir}; train with "
                "validation enabled to produce one")
        directory, step = best_dir, None
    mgr = CheckpointManager(directory)
    state, config, step = mgr.restore(step)
    mgr.close()
    if config is None:
        raise ValueError(f"Checkpoint at {directory} has no embedded config")
    params = state
    if isinstance(params, dict) and "generator_ema" in params:
        # serve the EMA weights when the trainer tracked them
        # (training.ema_decay > 0) — the smoothed shadow is what the
        # validation gate scored and what GAN-vocoder practice ships;
        # the raw 'generator' stays in the checkpoint for resume
        params = params["generator_ema"]
    for key in ("generator", "params"):
        if isinstance(params, dict) and key in params:
            params = params[key]
    return {"params": params}, config, step
