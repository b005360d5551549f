from . import geodesy, text, vectors  # noqa: F401
