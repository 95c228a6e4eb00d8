"""Source/sink utilities: filesystem helpers, batch readers,
object-store style single-object put/get, latest-file discovery."""

from python_tool_setup_spark.sources.fs import (
    hadoop_fs,
    path_exists,
    replace_dir,
    put_object,
    get_object,
    list_files,
)
from python_tool_setup_spark.sources.files import (
    read_batch,
    latest_file,
    read_latest_file,
    read_binary_files,
)

__all__ = [
    "hadoop_fs",
    "path_exists",
    "replace_dir",
    "put_object",
    "get_object",
    "list_files",
    "read_batch",
    "latest_file",
    "read_latest_file",
    "read_binary_files",
]
