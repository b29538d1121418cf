"""Packaging metadata stays in sync with the code.

The reference is a script checkout with no packaging at all; this framework
ships pyproject.toml with console entry points for every CLI (SURVEY.md §1
L6). These tests guard against drift between the declared entry points /
version / package data and the actual package — the failure mode that only
surfaces at install time otherwise.
"""

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def test_console_scripts_resolve(project):
    for name, target in project["scripts"].items():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func)), f"{name} -> {target}"


def test_version_is_dynamic_and_set(project):
    import mobilesuperresolution_tpu as pkg

    assert "version" in project["dynamic"]
    assert pkg.__version__


def test_packaged_speed_tables_exist():
    d = os.path.join(
        REPO, "mobilesuperresolution_tpu", "nas", "speed_tables"
    )
    names = os.listdir(d)
    assert "tpu_v5_lite.npy" in names
    assert "huawei_p30_cpu.npy" in names


def test_find_native_lib_env_override(tmp_path, monkeypatch):
    from mobilesuperresolution_tpu.core.native_path import find_native_lib

    fake = tmp_path / "libloader.so"
    fake.write_bytes(b"")
    monkeypatch.setenv("MSR_NATIVE_DIR", str(tmp_path))
    assert find_native_lib("libloader.so") == str(fake)
    assert find_native_lib("nonexistent.so") in (
        None,
        os.path.join(REPO, "native", "nonexistent.so"),
    )


def test_find_native_lib_repo_layout():
    # in this checkout the built libraries sit in <repo>/native
    from mobilesuperresolution_tpu.core.native_path import find_native_lib

    path = find_native_lib("libimresize.so")
    assert path == os.path.join(REPO, "native", "libimresize.so")
