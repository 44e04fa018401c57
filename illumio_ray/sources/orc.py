"""ORC source — Ray Data ships no read_orc; this is the extension-surface
proof that the engine ingests a columnar format it has no built-in for
(≙ SURVEY §2.10: new sources plug in declaratively).

Built on ray.data's FileBasedDatasource: file discovery, parallelism and
filesystem handling come from the base class; this class only decodes.
Each ORC stripe yields as its own Arrow table, so one large file streams
stripe-by-stripe instead of materializing whole; ``columns`` prunes at
the decode (ORC is columnar — unread columns never decompress).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FileBasedDatasource


class ORCDatasource(FileBasedDatasource):
    _FILE_EXTENSIONS = ["orc"]

    def __init__(self, paths, columns: list[str] | None = None, **kwargs):
        super().__init__(paths, file_extensions=self._FILE_EXTENSIONS,
                         **kwargs)
        self._columns = columns

    def _open_input_source(self, filesystem, path, **open_args):
        # ORC needs random access (footer + stripe index); the base class
        # default opens a forward-only stream
        return filesystem.open_input_file(path)

    def _read_stream(self, f, path: str):
        import pyarrow.orc as orc

        reader = orc.ORCFile(f)
        for i in range(reader.nstripes):
            batch = reader.read_stripe(i, columns=self._columns)
            yield pa.Table.from_batches([batch])


def read_orc(paths, columns: list[str] | None = None,
             **kwargs) -> rd.Dataset:
    """Read ORC file(s)/dir(s) into a Dataset, column-pruned at decode."""
    return rd.read_datasource(ORCDatasource(paths, columns=columns),
                              **kwargs)
