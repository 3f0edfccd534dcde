"""Config-system parity tests (YAML inheritance, JSON comments, CLI overrides)."""

import json

from nerf_fusion_tpu.utils.config import (ArgumentParserX, dict_to_args,
                                          parse_config_json, parse_config_yaml)


def test_yaml_include_configs(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nb: 2\n")
    (tmp_path / "child.yaml").write_text("include_configs: base.yaml\nb: 3\nc: 4\n")
    args = parse_config_yaml(tmp_path / "child.yaml")
    assert args.a == 1 and args.b == 3 and args.c == 4


def test_json_comments_and_python_literals(tmp_path):
    p = tmp_path / "hyper.json"
    p.write_text('[{"_": "comment", "x": 1}, {"y": None, "z": True}]')
    args = parse_config_json(p)
    assert args.x == 1 and args.y is None and args.z is True
    assert not hasattr(args, "_")


def test_argument_parser_x(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("alpha: 1.5\nname: hello\nmapping:\n  voxel_size: 0.1\n")
    parser = ArgumentParserX()
    args = parser.parse_args([str(cfg), "--alpha", "2.5"])
    assert args.alpha == 2.5
    assert args.name == "hello"
    assert args.mapping == {"voxel_size": 0.1}


def test_argument_parser_exec(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("alpha: 1.5\n")
    parser = ArgumentParserX()
    args = parser.parse_args([str(cfg), "--exec", "alpha=9.0"])
    assert args.alpha == 9.0


def test_dict_to_args():
    args = dict_to_args({"voxel_size": 0.1, "bound_min": [0, 0, 0]})
    assert args.voxel_size == 0.1


def test_reference_configs_parse():
    """Our shipped configs (mirroring the reference keys) must parse."""
    from pathlib import Path
    cfg_dir = Path(__file__).resolve().parent.parent / "configs"
    for name in ["fusion-lr-kt.yaml", "train-cnp.yaml"]:
        args = parse_config_yaml(cfg_dir / name)
        assert args is not None


def test_fast_config_tpu_knobs():
    """The documented TPU speed knobs of the fast config stay pinned: the
    parity config must NOT inherit them (reference-faithful defaults), and
    the fast config ships the round-5 latent-reuse gate."""
    from pathlib import Path
    cfg_dir = Path(__file__).resolve().parent.parent / "configs"
    fast = parse_config_yaml(cfg_dir / "fusion-lr-kt-fast.yaml")
    assert fast.mesh_reuse_latent_eps == 0.003
    assert fast.mesh_decode_precision == "default"
    assert fast.tracking["rgb"]["stride"] == 2
    parity = parse_config_yaml(cfg_dir / "fusion-lr-kt.yaml")
    assert getattr(parity, "mesh_reuse_latent_eps", 0.0) == 0.0
    assert getattr(parity, "mesh_decode_precision", "high") == "high"
    assert parity.tracking["rgb"]["stride"] == 1


def test_reference_hyper_json_parses():
    from pathlib import Path
    ref = Path("/root/reference/ckpt/default/hyper.json")
    if not ref.exists():
        return
    args = parse_config_json(ref)
    assert args.code_length == 29
    assert args.network_specs["dims"] == [128, 128, 128, 128]


def test_enable_compile_cache_respects_env(tmp_path, monkeypatch):
    from nerf_fusion_tpu.utils.cache import enable_compile_cache

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/explicit")
    assert enable_compile_cache() == "/explicit"
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
    assert enable_compile_cache() == ""          # "" disables, stays ""
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    d = enable_compile_cache()
    assert d.startswith(str(tmp_path))
    import os
    assert os.path.isdir(d)
