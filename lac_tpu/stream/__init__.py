from .container import BlockEntry, ContainerHeader, read_container, write_container  # noqa: F401
