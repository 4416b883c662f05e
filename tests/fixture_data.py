"""Synthetic 4-image COCO-format fixture dataset for e2e tests.

The generator now lives in the package (``litepose_tpu.data.synthetic``) so
bench/demo tooling can use it too; this module keeps the historical test
import path.
"""

from litepose_tpu.data.synthetic import make_fixture  # noqa: F401
