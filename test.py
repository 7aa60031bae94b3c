#!/usr/bin/env python
"""NTIRE test harness — drop-in equivalent of the reference test.py.

    python test.py --test_dir data/DIV2K_test_LR --model_id 29 \
        [--valid_dir data/DIV2K_valid_LR] [--save_dir results]

Selects a team model by ID (29 = FreqFusionSR, reference test.py:22-49),
runs x4 SR over the valid/test splits, and reports wall-clock runtime
(here: host perf_counter around the fully-materialized device run, the
equivalent boundary to the reference's CUDA events, test.py:63-70).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time


def select_model(args):
    model_id = args.model_id
    if model_id == 0:
        # DAT baseline, ICCV 2023 (reference test.py:30-35)
        from freqfusion_tpu.interface.dat_baseline import main as DAT
        name = f"{model_id:02}_DAT_baseline"
        model_path = os.path.join("model_zoo", "team00_dat.pth")
        return DAT, model_path, name
    if model_id == 29:
        from freqfusion_tpu.interface.io import main as FreqFusionSR
        name = f"{model_id:02}_FreqFusionSR"
        model_path = os.path.join("model_zoo", "team29_FreqFusionSR")
        return FreqFusionSR, model_path, name
    raise NotImplementedError(f"Model {model_id} is not implemented.")


def run(model_func, model_name, model_path, args, mode="test"):
    data_path = args.valid_dir if mode == "valid" else args.test_dir
    assert data_path is not None, "specify the dataset path"
    save_path = os.path.join(args.save_dir, model_name, mode)
    os.makedirs(save_path, exist_ok=True)

    t0 = time.perf_counter()
    model_func(model_dir=model_path, input_path=data_path,
               output_path=save_path, device=None)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"Model {model_name} runtime (Including I/O): {dt:.1f} ms")
    return dt


def main(args):
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("NTIRE2026-ImageSRx4")

    model_func, model_path, model_name = select_model(args)
    logger.info(model_name)

    results = {}
    json_path = os.path.join(os.getcwd(), "results.json")
    if os.path.exists(json_path):
        with open(json_path) as f:
            results = json.load(f)

    if args.valid_dir is not None:
        results[f"{model_name}_valid_ms"] = run(
            model_func, model_name, model_path, args, mode="valid")
    if args.test_dir is not None:
        results[f"{model_name}_test_ms"] = run(
            model_func, model_name, model_path, args, mode="test")

    with open(json_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("NTIRE2026-ImageSRx4")
    parser.add_argument("--valid_dir", default=None, type=str)
    parser.add_argument("--test_dir", default=None, type=str)
    parser.add_argument("--save_dir", default="results", type=str)
    parser.add_argument("--model_id", default=29, type=int)
    main(parser.parse_args())
