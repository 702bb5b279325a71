"""CLI entry points mirroring the reference scripts.

- ``python -m bcp_tpu.cli.train_la``       <-> `code/LA_BCP_train.py`
- ``python -m bcp_tpu.cli.train_acdc``     <-> `code/ACDC_BCP_train.py`
- ``python -m bcp_tpu.cli.train_pancreas`` <-> `code/pancreas/train_pancreas.py`
- ``python -m bcp_tpu.cli.test_la``        <-> `code/test_LA.py`
- ``python -m bcp_tpu.cli.test_acdc``      <-> `code/test_ACDC.py`
- ``python -m bcp_tpu.cli.kde_demo``       <-> `code/KDE_demo.py`
"""
