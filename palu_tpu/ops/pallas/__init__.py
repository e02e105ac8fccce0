from . import palu_decode, fwht  # noqa: F401
