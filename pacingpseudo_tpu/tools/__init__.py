from .scribbles import (
    skeletonize,
    generate_scribble,
    detect_endpoints,
    delete_endpoints,
)
