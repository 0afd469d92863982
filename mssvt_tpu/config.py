"""YAML config system with ``_BASE_CONFIG_`` inheritance and CLI overrides.

Behavioral parity with the reference config system (ref: pcdet/config.py:7-85):
- global ``cfg`` EasyDict with ROOT_DIR / LOCAL_RANK
- ``cfg_from_yaml_file`` with recursive merge and single-file ``_BASE_CONFIG_``
  inheritance
- ``cfg_from_list`` dotted-path overrides with literal_eval + type coercion
- ``log_config_to_file`` recursive pretty-printer
"""

from __future__ import annotations

from ast import literal_eval
from pathlib import Path

import yaml

from .utils.edict import EasyDict


def log_config_to_file(cfg_dict, pre="cfg", logger=None):
    for key, val in cfg_dict.items():
        if isinstance(val, EasyDict):
            logger.info("----------- %s -----------" % key)
            log_config_to_file(val, pre=pre + "." + key, logger=logger)
            continue
        logger.info("%s.%s: %s" % (pre, key, val))


def cfg_from_list(cfg_list, config):
    """Set config keys via list (e.g., from command line --set KEY VALUE ...)."""
    assert len(cfg_list) % 2 == 0
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split(".")
        d = config
        for subkey in key_list[:-1]:
            assert subkey in d, "NotFoundKey: %s" % subkey
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, "NotFoundKey: %s" % subkey
        try:
            value = literal_eval(v)
        except (ValueError, SyntaxError):
            value = v

        if isinstance(value, dict):
            d[subkey].update(EasyDict(value))
        elif type(value) != type(d[subkey]) and isinstance(d[subkey], EasyDict):
            key_val_list = v.split(",")
            for src in key_val_list:
                cur_key, cur_val = src.split(":")
                val_type = type(d[subkey][cur_key])
                cur_val = val_type(cur_val)
                d[subkey][cur_key] = cur_val
        elif type(value) != type(d[subkey]) and isinstance(d[subkey], list):
            val_list = v.split(",")
            for i, x in enumerate(val_list):
                val_list[i] = type(d[subkey][0])(x)
            d[subkey] = val_list
        else:
            assert type(value) == type(d[subkey]), (
                "type {} does not match original type {}".format(type(value), type(d[subkey]))
            )
            d[subkey] = value


def merge_new_config(config, new_config):
    if "_BASE_CONFIG_" in new_config:
        with open(new_config["_BASE_CONFIG_"], "r") as f:
            yaml_config = yaml.safe_load(f)
        config.update(EasyDict(yaml_config))

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if not isinstance(val, dict):
            config[key] = val
            continue
        if key not in config:
            config[key] = EasyDict()
        merge_new_config(config[key], val)

    return config


def cfg_from_yaml_file(cfg_file, config):
    with open(cfg_file, "r") as f:
        new_config = yaml.safe_load(f)
        merge_new_config(config=config, new_config=new_config)
    return config


cfg = EasyDict()
cfg.ROOT_DIR = (Path(__file__).resolve().parent / "../").resolve()
cfg.LOCAL_RANK = 0
