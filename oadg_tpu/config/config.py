"""mmcv-style python-file config system.

Re-implements the subset of ``mmcv.Config`` the reference relies on
(reference tools/train.py:95-97,129 and configs/*): python config files,
``_base_`` inheritance with deep-merge and ``_delete_`` keys, dotted-key
CLI overrides (``--cfg-options``), ``custom_imports``, and dot attribute
access on nested dicts.

The reference's OA-DG configs use absolute ``/ws/external/...`` base paths
(configs/OA-DG/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes_oadg.py:2);
``_normalize_base_path`` remaps those onto this repo's ``configs/`` tree so
the original files run unchanged.
"""
from __future__ import annotations

import ast
import copy
import importlib
import os
import os.path as osp
import sys
import tempfile
import types
from typing import Any, Dict, List, Optional

DELETE_KEY = "_delete_"
BASE_KEY = "_base_"
# Path prefixes used by the reference's configs that must be remapped into
# this repo (reference configs hard-code a container path).
_LEGACY_PREFIXES = ("/ws/external/configs/", "/ws/external/")


def _repo_config_root() -> str:
    # <repo>/oadg_tpu/config/config.py -> <repo>
    return osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


class ConfigDict(dict):
    """dict with attribute access, recursively."""

    def __missing__(self, key):
        raise KeyError(key)

    def __getattr__(self, name):
        try:
            value = self[name]
        except KeyError:
            raise AttributeError(
                f"'ConfigDict' object has no attribute '{name}'")
        return value

    def __setattr__(self, name, value):
        self[name] = _to_config_dict(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, _to_config_dict(value))

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def __deepcopy__(self, memo):
        other = ConfigDict()
        memo[id(self)] = other
        for k, v in self.items():
            dict.__setitem__(other, copy.deepcopy(k, memo), copy.deepcopy(v, memo))
        return other

    def get(self, key, default=None):
        return dict.get(self, key, default)


def _to_config_dict(obj):
    if isinstance(obj, ConfigDict):
        return obj
    if isinstance(obj, dict):
        return ConfigDict({k: _to_config_dict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        t = type(obj) if type(obj) in (list, tuple) else list
        return t(_to_config_dict(v) for v in obj)
    return obj


def _normalize_base_path(base: str, cur_dir: str) -> str:
    """Resolve a ``_base_`` entry to an existing file path."""
    for prefix in _LEGACY_PREFIXES:
        if base.startswith(prefix):
            rel = base[len(prefix):]
            if not rel.startswith("configs/") and prefix.endswith("configs/"):
                rel = osp.join("configs", rel)
            cand = osp.join(_repo_config_root(), rel)
            if osp.isfile(cand):
                return cand
            # fall through and try other resolutions
            base = rel
    if osp.isabs(base) and osp.isfile(base):
        return base
    cand = osp.join(cur_dir, base)
    if osp.isfile(cand):
        return cand
    cand = osp.join(_repo_config_root(), base)
    if osp.isfile(cand):
        return cand
    raise FileNotFoundError(f"base config not found: {base} (from {cur_dir})")


def _load_py_file(filename: str) -> Dict[str, Any]:
    """Execute a python config file and return its module-level names."""
    filename = osp.abspath(osp.expanduser(filename))
    if not osp.isfile(filename):
        raise FileNotFoundError(filename)
    with open(filename, encoding="utf-8") as f:
        content = f.read()
    try:
        ast.parse(content)
    except SyntaxError as e:
        raise SyntaxError(f"Config {filename} has syntax errors: {e}")
    mod = types.ModuleType("_oadg_cfg_")
    mod.__file__ = filename
    exec(compile(content, filename, "exec"), mod.__dict__)
    cfg = {
        k: v
        for k, v in mod.__dict__.items()
        if not k.startswith("__") and not isinstance(v, (types.ModuleType, types.FunctionType, type))
    }
    return cfg


def merge_dict(base: dict, override: dict, allow_list_keys: bool = False) -> dict:
    """Deep-merge ``override`` into ``base`` (mmcv semantics).

    ``override[k] = dict(_delete_=True, ...)`` replaces rather than merges.
    """
    base = copy.deepcopy(base)
    for k, v in override.items():
        if allow_list_keys and k.isdigit() and isinstance(base, list):
            k = int(k)
            if len(base) <= k:
                raise KeyError(f"index {k} exceeds list length {len(base)}")
            base[k] = merge_dict(base[k], v, allow_list_keys) if isinstance(v, dict) else v
            continue
        if isinstance(v, dict):
            if k in base and isinstance(base[k], dict) and not v.pop(DELETE_KEY, False):
                base[k] = merge_dict(base[k], v, allow_list_keys)
            else:
                v = {kk: vv for kk, vv in v.items() if kk != DELETE_KEY}
                base[k] = copy.deepcopy(v)
        else:
            base[k] = copy.deepcopy(v)
    return base


def _file2dict(filename: str) -> Dict[str, Any]:
    cfg_dict = _load_py_file(filename)
    cur_dir = osp.dirname(osp.abspath(filename))
    if BASE_KEY in cfg_dict:
        base_files = cfg_dict.pop(BASE_KEY)
        if isinstance(base_files, str):
            base_files = [base_files]
        merged: Dict[str, Any] = {}
        for bf in base_files:
            bpath = _normalize_base_path(bf, cur_dir)
            bdict = _file2dict(bpath)
            dup = set(merged) & set(bdict)
            # mmcv forbids duplicate keys between multiple bases; later base
            # values win here instead, matching practical usage.
            merged = merge_dict(merged, bdict)
        cfg_dict = merge_dict(merged, cfg_dict)
    return cfg_dict


class Config:
    """Config object with dot access; wraps a nested ConfigDict."""

    def __init__(self, cfg_dict: Optional[dict] = None, filename: Optional[str] = None):
        if cfg_dict is None:
            cfg_dict = {}
        object.__setattr__(self, "_cfg_dict", _to_config_dict(cfg_dict))
        object.__setattr__(self, "_filename", filename)

    # --- construction -----------------------------------------------------
    @staticmethod
    def fromfile(filename: str, import_custom_modules: bool = True) -> "Config":
        cfg_dict = _file2dict(filename)
        cfg = Config(cfg_dict, filename=filename)
        if import_custom_modules and cfg_dict.get("custom_imports"):
            ci = cfg_dict["custom_imports"]
            imports = ci.get("imports", [])
            allow_failed = ci.get("allow_failed_imports", True)
            if isinstance(imports, str):
                imports = [imports]
            for name in imports:
                # Reference configs import 'mmdet.datasets.pipelines.oa_mix';
                # remap mmdet.* onto this package so they resolve.
                candidates = [name]
                if name.startswith("mmdet."):
                    tail = name.split(".")[-1]
                    candidates = [
                        f"oadg_tpu.data.pipelines.{tail}",
                        f"oadg_tpu.models.{tail}",
                        name,
                    ]
                ok = False
                for cand in candidates:
                    try:
                        importlib.import_module(cand)
                        ok = True
                        break
                    except ImportError:
                        continue
                if not ok and not allow_failed:
                    raise ImportError(f"custom_imports failed for {name}")
        return cfg

    @staticmethod
    def fromstring(cfg_str: str, file_format: str = ".py") -> "Config":
        with tempfile.NamedTemporaryFile("w", suffix=file_format, delete=False) as f:
            f.write(cfg_str)
            path = f.name
        try:
            return Config.fromfile(path)
        finally:
            os.unlink(path)

    # --- access -----------------------------------------------------------
    @property
    def filename(self):
        return self._filename

    def __getattr__(self, name):
        return getattr(self._cfg_dict, name)

    def __getitem__(self, name):
        return self._cfg_dict[name]

    def __setattr__(self, name, value):
        self._cfg_dict[name] = value

    def __setitem__(self, name, value):
        self._cfg_dict[name] = value

    def __contains__(self, name):
        return name in self._cfg_dict

    def __iter__(self):
        return iter(self._cfg_dict)

    def __len__(self):
        return len(self._cfg_dict)

    def __repr__(self):
        return f"Config (path: {self._filename}): {self._cfg_dict!r}"

    def __deepcopy__(self, memo):
        other = Config.__new__(Config)
        object.__setattr__(other, "_cfg_dict", copy.deepcopy(self._cfg_dict, memo))
        object.__setattr__(other, "_filename", self._filename)
        return other

    def copy(self) -> "Config":
        return copy.deepcopy(self)

    def get(self, key, default=None):
        return self._cfg_dict.get(key, default)

    def keys(self):
        return self._cfg_dict.keys()

    def items(self):
        return self._cfg_dict.items()

    def values(self):
        return self._cfg_dict.values()

    def to_dict(self) -> dict:
        def _plain(o):
            if isinstance(o, dict):
                return {k: _plain(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return type(o)(_plain(v) for v in o)
            return o
        return _plain(dict(self._cfg_dict))

    # --- mutation ---------------------------------------------------------
    def merge_from_dict(self, options: Dict[str, Any], allow_list_keys: bool = True):
        """Merge dotted-key overrides, e.g. ``{'model.backbone.depth': 101}``.

        Mirrors ``Config.merge_from_dict`` used by ``--cfg-options``
        (reference tools/train.py:60-69,95-97).
        """
        option_cfg: Dict[str, Any] = {}
        for full_key, v in options.items():
            d = option_cfg
            keys = full_key.split(".")
            for k in keys[:-1]:
                d = d.setdefault(k, {})
            d[keys[-1]] = v
        merged = merge_dict(self.to_dict(), option_cfg, allow_list_keys=allow_list_keys)
        object.__setattr__(self, "_cfg_dict", _to_config_dict(merged))

    # --- dump -------------------------------------------------------------
    @property
    def pretty_text(self) -> str:
        import pprint
        return pprint.pformat(self.to_dict(), width=100, sort_dicts=False)

    def dump(self, file: Optional[str] = None):
        text = "cfg = " + self.pretty_text + "\n"
        if file is None:
            return text
        with open(file, "w", encoding="utf-8") as f:
            f.write(text)


import argparse


class DictAction(argparse.Action):
    """argparse action for ``KEY=VALUE`` pairs with literal-eval values
    (mmcv ``DictAction`` contract, reference tools/train.py:60)."""

    def __call__(self, parser, namespace, values, option_string=None):
        options = getattr(namespace, self.dest, None) or {}
        for kv in values:
            key, val = kv.split("=", maxsplit=1)
            options[key] = self.parse_value(val)
        setattr(namespace, self.dest, options)

    @staticmethod
    def parse_value(val: str):
        try:
            return ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        if val.lower() in ("true", "false"):
            return val.lower() == "true"
        if "," in val:  # tuple of values
            return tuple(DictAction.parse_value(v) for v in val.split(","))
        return val
