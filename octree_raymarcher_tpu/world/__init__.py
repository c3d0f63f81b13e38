from .device import DeviceWorld, pack_chunks, single_chunk_world
