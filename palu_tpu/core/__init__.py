from . import hadamard, lowrank, quant  # noqa: F401
