from .uddsketch import UDDSketch  # noqa: F401
