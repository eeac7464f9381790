"""Filesystem seam for index artifacts (FSDirectory analog,
lucene/core/src/java/org/apache/lucene/store/FSDirectory.java:89).

All builder/reader side-channel IO (segment manifests, field_stats, staged
shard reads, postings/norms/docs shard writes) goes through a
``pyarrow.fs.FileSystem`` resolved from the index root, so an index root can
be a plain local path, a ``file://`` URI, or any pyarrow-supported store
(S3/GCS/HDFS). Spark reads/writes keep using the root-form path (Spark has
its own Hadoop FS layer); only the pyarrow side-channel goes through here.

Atomicity: manifests and field_stats use write-tmp + ``FileSystem.move``
(an atomic rename on local/HDFS). On stores without atomic rename (S3) the
move degrades to copy+delete — still safe here because every such file is
self-validating JSON written once (last-wins), never appended.
"""

from __future__ import annotations

import json
import posixpath
from typing import List, Tuple

from pyarrow import fs as pafs


class _ObjectStoreHandler(pafs.FileSystemHandler):
    """Local-backed pyarrow filesystem with OBJECT-STORE semantics for the
    ``s3mock://`` scheme: ``move`` raises (S3 has no atomic rename, so
    write_json_atomic must take its degraded last-wins path); everything
    else delegates to LocalFileSystem. Used by the cluster-shaped smoke
    test — on a real deployment ``s3://`` roots resolve through
    pafs.FileSystem.from_uri to the genuine S3FileSystem."""

    def __init__(self):
        self._fs = pafs.LocalFileSystem()

    def get_type_name(self):
        return "s3mock"

    def __eq__(self, other):
        return isinstance(other, _ObjectStoreHandler)

    def __ne__(self, other):
        return not isinstance(other, _ObjectStoreHandler)

    def normalize_path(self, path):
        return path

    def get_file_info(self, paths):
        return self._fs.get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self._fs.get_file_info(selector)

    def create_dir(self, path, recursive):
        self._fs.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._fs.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._fs.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError

    def delete_file(self, path):
        self._fs.delete_file(path)

    def move(self, src, dest):
        raise NotImplementedError("object store: no atomic rename")

    def copy_file(self, src, dest):
        self._fs.copy_file(src, dest)

    def open_input_stream(self, path):
        return self._fs.open_input_stream(path)

    def open_input_file(self, path):
        return self._fs.open_input_file(path)

    def open_output_stream(self, path, metadata=None):
        return self._fs.open_output_stream(path)

    def open_append_stream(self, path, metadata=None):
        return self._fs.open_append_stream(path)


def resolve(root: str) -> Tuple[pafs.FileSystem, str]:
    """(FileSystem, fs-native base path) for a path or URI."""
    if root.startswith("s3mock://"):
        return pafs.PyFileSystem(_ObjectStoreHandler()), root[len("s3mock://"):]
    if "://" in root:
        return pafs.FileSystem.from_uri(root)
    return pafs.LocalFileSystem(), root


def exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def mkdirs(fs: pafs.FileSystem, path: str) -> None:
    fs.create_dir(path, recursive=True)


def read_json(fs: pafs.FileSystem, path: str):
    with fs.open_input_stream(path) as f:
        return json.loads(f.read().decode())


def write_json_atomic(fs: pafs.FileSystem, path: str, obj) -> None:
    """tmp + rename where the store supports it; direct last-wins write
    elsewhere (the content is a self-validating single JSON document)."""
    data = json.dumps(obj).encode()
    tmp = path + ".tmp"
    try:
        with fs.open_output_stream(tmp) as f:
            f.write(data)
        fs.move(tmp, path)
    except (NotImplementedError, OSError):
        with fs.open_output_stream(path) as f:
            f.write(data)
        try:
            fs.delete_file(tmp)
        except (NotImplementedError, OSError, FileNotFoundError):
            pass


def delete(fs: pafs.FileSystem, path: str) -> None:
    if exists(fs, path):
        info = fs.get_file_info(path)
        if info.type == pafs.FileType.Directory:
            fs.delete_dir(path)
        else:
            fs.delete_file(path)


def list_files(fs: pafs.FileSystem, directory: str, prefix: str = "", suffix: str = "") -> List[str]:
    """Sorted fs-native file paths directly under ``directory`` matching
    basename prefix/suffix (the staged-shard / manifest 'glob')."""
    if not exists(fs, directory):
        return []
    sel = pafs.FileSelector(directory, recursive=False, allow_not_found=True)
    out = []
    for info in fs.get_file_info(sel):
        if info.type != pafs.FileType.File:
            continue
        name = posixpath.basename(info.path)
        if name.startswith(prefix) and name.endswith(suffix):
            out.append(info.path)
    return sorted(out)
