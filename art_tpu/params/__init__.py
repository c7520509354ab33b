"""Parameter & profile system (reference: procparams/profilestore, SURVEY §2.9)."""

from art_tpu.params.keyfile import KeyFile  # noqa: F401
from art_tpu.params.procparams import ProcParams  # noqa: F401
