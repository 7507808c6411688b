# m2tts_tpu — TPU-native TTS framework build/ops targets.
# Mirrors the reference Makefile surface (install/setup/test/lint/format/
# train/train-stage2/resume/download-data/synthesize/demo/clean/info;
# reference Makefile:84-144) on the JAX/TPU stack.

PYTHON ?= python
CONFIG ?= configs/stage1_poc.yaml
CONFIG2 ?= configs/stage2_quality.yaml
CKPT_DIR ?= outputs/checkpoints
TEXT ?= Hello world, this is a test of the TPU text to speech system.

.PHONY: help install install-dev setup test test-quick lint format train \
        train-poc train-stage2 resume resume-stage2 download-data \
        download-full synthesize demo bench evaluate export \
        clean clean-cache info \
        native

native:
	$(PYTHON) -c "from m2tts_tpu.frontend.native import build_native; \
		import sys; sys.exit(0 if build_native(force=True) else 1)"

help:
	@echo "m2tts_tpu targets:"
	@echo "  install        pip install -e . (console scripts m2tts-*)"
	@echo "  setup          create output/data directories"
	@echo "  test           full pytest suite (virtual 8-device CPU mesh)"
	@echo "  test-quick     7-part pipeline smoke suite"
	@echo "  lint           pyflakes-level checks (compileall + pyflakes if present)"
	@echo "  format         no-op placeholder (code is hand-formatted)"
	@echo "  train          stage-1 training     (CONFIG=$(CONFIG))"
	@echo "  train-stage2   stage-2 GAN training (CONFIG2=$(CONFIG2))"
	@echo "  resume         resume stage-1 from latest checkpoint"
	@echo "  resume-stage2  resume stage-2 from latest checkpoint"
	@echo "  download-data  fetch LJSpeech (DATA_DIR, SUBSET=N optional)"
	@echo "  synthesize     text -> WAV (TEXT=..., CKPT=...)"
	@echo "  demo           untrained end-to-end demo synthesis"
	@echo "  bench          run the benchmark harness (one JSON line)"
	@echo "  evaluate       quality metrics for a checkpoint (CKPT=, DATA_DIR=)"
	@echo "  export         StableHLO deployment artifact (CKPT=, OUT=)"
	@echo "  info           device / model-size report"
	@echo "  clean          remove caches and build artifacts"
	@echo "  clean-cache    remove dataset/compile caches (keeps checkpoints)"

install:
	$(PYTHON) -m pip install -e .

install-dev:
	$(PYTHON) -m pip install -e . pytest

setup:
	mkdir -p outputs/checkpoints outputs/samples outputs/logs data

test:
	$(PYTHON) -m pytest tests/ -q

test-quick:
	$(PYTHON) scripts/test_pipeline.py --cpu

lint:
	$(PYTHON) -m compileall -q m2tts_tpu scripts tests bench.py __graft_entry__.py
	$(PYTHON) scripts/lint.py m2tts_tpu scripts tests bench.py __graft_entry__.py

format:
	@echo "no formatter configured; code is hand-formatted"

train:
	$(PYTHON) scripts/train.py --config $(CONFIG)

train-poc:
	$(PYTHON) scripts/train.py --config configs/stage1_poc.yaml

train-stage2:
	$(PYTHON) scripts/train_stage2.py --config $(CONFIG2)

resume:
	$(PYTHON) scripts/train.py --config $(CONFIG) --resume

resume-stage2:
	$(PYTHON) scripts/train_stage2.py --config $(CONFIG2) --resume

download-data:
	$(PYTHON) scripts/download_data.py --data-dir $(or $(DATA_DIR),data) \
		$(if $(SUBSET),--subset-size $(SUBSET),)

download-full:
	$(PYTHON) scripts/download_data.py --dataset ljspeech \
		--data-dir $(or $(DATA_DIR),data)

synthesize:
	$(PYTHON) scripts/synthesize.py --text "$(TEXT)" \
		$(if $(CKPT),--checkpoint $(CKPT),--checkpoint $(CKPT_DIR)) \
		--output outputs/samples/synthesized.wav

demo:
	$(PYTHON) scripts/test_pipeline.py --cpu

bench:
	$(PYTHON) bench.py

evaluate:
	$(PYTHON) scripts/evaluate.py --checkpoint $(or $(CKPT),$(CKPT_DIR)) \
		$(if $(DATA_DIR),--data-dir $(DATA_DIR),) -t "$(TEXT)"

info:
	$(PYTHON) -c "from m2tts_tpu.utils.device import get_device_info; \
	import json; print(json.dumps(get_device_info(), indent=2, default=str))"

export:
	$(PYTHON) scripts/export_model.py --checkpoint $(or $(CKPT),$(CKPT_DIR)) \
		--output $(or $(OUT),exported)

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf build dist *.egg-info .pytest_cache

clean-cache:
	rm -rf data/*/cache outputs/*/cache .jax_cache
