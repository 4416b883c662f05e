import json

import numpy as np
import pytest

from litepose_tpu.arch import ArchManager, load_arch, make_divisible, validate_arch
from litepose_tpu.arch.macs import gmacs
from litepose_tpu.arch.zoo import ARCH_ZOO, get_arch


REF_CONFIG_DIR = "/root/reference/mobile_configs"


@pytest.mark.parametrize(
    "name", ["search-XS", "search-S", "search-M", "search-L", "prune-S", "prune-M", "prune-L"]
)
def test_zoo_matches_reference_json(name):
    ours = ARCH_ZOO[name].to_dict()
    with open(f"{REF_CONFIG_DIR}/{name}.json") as f:
        ref = json.load(f)
    assert ours == ref


def test_load_reference_json_unchanged():
    arch = load_arch(f"{REF_CONFIG_DIR}/search-S.json")
    assert arch.img_size == 448
    assert arch.deconv_setting == (32, 24, 32)
    assert arch.stage_channels == (16, 16, 32, 48, 120)


@pytest.mark.parametrize(
    "name,expected",
    [("search-XS", 1.2), ("search-S", 5.0), ("search-M", 7.8), ("search-L", 13.7)],
)
def test_macs_match_published_gmacs(name, expected):
    # README.md publishes XS 1.2 / S 5.0 / M 7.8 / L 13.7 GMACs (CrowdPose, 14 joints)
    g = gmacs(get_arch(name), num_joints=14)
    assert abs(g - expected) < 0.15, f"{name}: {g} vs {expected}"


def test_make_divisible():
    assert make_divisible(24 * 0.5, 8) == 16
    assert make_divisible(160 * 0.75, 8) == 120
    assert make_divisible(32 * 0.25, 8) == 8
    assert make_divisible(15, 8) == 16


def test_arch_manager_random_sample_in_space():
    m = ArchManager(seed=0)
    for _ in range(20):
        a = m.random_sample()
        assert a.img_size in (256, 320, 384, 448, 512)
        assert a.input_channel in m.channel_choices(24)
        assert len(a.backbone_setting) == 4
        for st, (c, n, s) in zip(a.backbone_setting, m.stage_setting):
            assert st.num_blocks == n and st.stride == s
            assert st.channel in m.channel_choices(c)
            assert all(b == (6, 7) for b in st.block_setting)
        assert not validate_arch(a.to_dict())


def test_arch_manager_fixed_sample_matches_reference_semantics():
    m = ArchManager()
    a = m.fixed_sample(reso=256, ratio=0.5)
    assert a.img_size == 256
    assert a.input_channel == 16  # make_divisible(24*0.5, 8)
    assert a.deconv_setting == (32, 24, 16)
    assert tuple(s.channel for s in a.backbone_setting) == (16, 32, 48, 80)


def test_arch_manager_pinned_search_arch():
    m = ArchManager(seed=0)
    pinned = get_arch("search-S")
    m.is_search = True
    m.search_arch = pinned
    assert m.random_sample() is pinned
