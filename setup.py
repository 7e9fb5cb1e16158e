"""Shim for offline/legacy installs (environments without the wheel
package, where PEP 660 editable installs cannot build): configuration
lives in pyproject.toml."""
from setuptools import setup

setup()
