from .device import DeviceWorld, pack_chunks, single_chunk_world
from .alloc import FreeList, PoolAllocator, WorldAllocator
from .edit import build, destroy, replace
from .world import World
from .lod import defrag, lod
from .pick import pick, cursor_box, PickResult
