"""Config parity guard: every key in all 31 ported YAMLs must map to a
known flag of its runner (the reference enforces the same —
``parser_utils.py:30-33``), and the YAML merge must apply."""
import glob
import os

import pytest
import yaml

from sgp_tpu.exp.common import load_config
from sgp_tpu.utils.config import config as global_config

CONFIG_DIR = global_config["config_dir"]


def _parser_for(path: str):
    from sgp_tpu.exp.run_closed_form import configure_parser as p_cf
    from sgp_tpu.exp.run_traffic_baselines import configure_parser as p_bl
    from sgp_tpu.exp.run_traffic_sgp import configure_parser as p_sgp
    name = os.path.basename(path)
    if name.startswith("gesn"):
        return p_cf()
    if name.startswith("sgp"):
        parser = p_sgp()
        # flags added by the largescale __main__ entry
        from sgp_tpu.exp.common import str2bool
        parser.add_argument("--iid-stratified", type=str2bool,
                            default=False)
        parser.add_argument("--times-per-batch", type=int, default=32)
        return parser
    return p_bl()


ALL_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*", "*.yaml")))


def test_all_31_configs_present():
    assert len(ALL_CONFIGS) == 31


@pytest.mark.parametrize("path", ALL_CONFIGS,
                         ids=[os.path.relpath(p, CONFIG_DIR)
                              for p in ALL_CONFIGS])
def test_config_keys_map_to_flags(path):
    cfg = yaml.safe_load(open(path))
    parser = _parser_for(path)
    defaults = vars(parser.parse_args([]))
    unknown = [k for k in cfg if k not in defaults]
    assert not unknown, f"{path}: unknown config keys {unknown}"


def test_yaml_merge_applies():
    cfg = load_config("traffic/sgp_la.yaml")
    assert cfg["reservoir_size"] == 64
    assert cfg["lr_milestones"] == [40, 80, 120]
    parser = _parser_for(os.path.join(CONFIG_DIR, "traffic/sgp_la.yaml"))
    from sgp_tpu.exp.common import Experiment

    captured = {}

    def run_fn(args):
        captured.update(vars(args))
        return None

    Experiment(run_fn, parser).run(["--config", "traffic/sgp_la.yaml",
                                    "--seed", "1"])
    assert captured["reservoir_size"] == 64
    assert captured["hidden_size"] == 960
    assert captured["bidirectional"] is True


def test_hyperopt_through_runner():
    """The search harness drives a real runner config dict."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sgp_tpu.exp.hyperopt import run_search
    from sgp_tpu.exp.run_traffic_sgp import (configure_parser,
                                             run_experiment)
    from sgp_tpu.exp.common import Experiment

    base = ["--dataset-name", "synthetic", "--synthetic-nodes", "16",
            "--synthetic-steps", "200", "--epochs", "1",
            "--batches-epoch", "2", "--reservoir-size", "4",
            "--mlp-size", "8", "--batch-size", "8", "--seed", "3",
            "--fused", "false"]

    def run_fn(cfg):
        argv = base + [f"--hidden-size", str(cfg["hidden_size"])]
        return Experiment(run_experiment, configure_parser()).run(argv)

    out = run_search(run_fn, {}, {"hidden_size": [8, 16]}, mode="grid",
                     monitor="test_mae")
    assert out["best_config"]["hidden_size"] in (8, 16)
    assert len(out["trials"]) == 2


def test_hyperopt_parallel_workers():
    """n_workers>1 runs all trials and picks the same best as serial."""
    from sgp_tpu.exp.hyperopt import run_search

    def run_fn(cfg):
        return {"test_mae": abs(cfg["h"] - 12)}

    space = {"h": [8, 12, 16, 20]}
    serial = run_search(run_fn, {}, space, mode="grid",
                        monitor="test_mae")
    par = run_search(run_fn, {}, space, mode="grid",
                     monitor="test_mae", n_workers=4)
    assert par["best_config"] == serial["best_config"] == {"h": 12}
    assert len(par["trials"]) == 4
    assert [t["config"] for t in par["trials"]] == \
        [t["config"] for t in serial["trials"]]
