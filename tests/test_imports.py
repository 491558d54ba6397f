"""Every module in the package must import cleanly (catches dead imports
in corners no other test touches)."""

import importlib
import pkgutil

import lanetpu


def test_all_modules_import():
    failures = []
    for info in pkgutil.walk_packages(lanetpu.__path__, "lanetpu."):
        if "libltpuhost" in info.name:
            continue  # the C shared library is a ctypes target, not a module
        try:
            importlib.import_module(info.name)
        except Exception as e:  # noqa: BLE001
            failures.append((info.name, repr(e)))
    assert not failures, failures


def test_version_string():
    assert isinstance(lanetpu.__version__, str)
    assert lanetpu.__version__.count(".") == 2
