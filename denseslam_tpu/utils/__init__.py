from . import camera, image, lie, timing  # noqa: F401
