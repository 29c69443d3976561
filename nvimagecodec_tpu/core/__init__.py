from .types import (  # noqa: F401
    Backend,
    BackendKind,
    ChromaSubsampling,
    ColorSpec,
    JpegEncoding,
    Orientation,
    Priority,
    ProcessingStatus,
    Region,
    SampleDataType,
    SampleFormat,
    Status,
)
from .image_info import ImageInfo, PlaneInfo  # noqa: F401
from .interfaces import (  # noqa: F401
    DecodeParams,
    DecodeResult,
    EncodeParams,
    EncodeResult,
    Jpeg2kEncodeParams,
    JpegEncodeParams,
)
from .code_stream import CodeStream  # noqa: F401
from .registry import CodecRegistry, global_registry  # noqa: F401
from .scheduler import GenericDecoder, GenericEncoder  # noqa: F401
from .promise import ProcessingResultsFuture, ProcessingResultsPromise  # noqa: F401
