"""Thin shim for environments whose setuptools/pip lack the `wheel`
package needed by the PEP 660 editable path (all real metadata lives in
pyproject.toml — setuptools >= 61 reads the [project] table from
there). Lets `pip install -e . --no-use-pep517` work offline."""

from setuptools import setup

setup()
