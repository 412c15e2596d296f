"""Minimal RFC 6455 WebSocket codec over asyncio streams.

Stdlib-only (the environment ships no websockets package). Server-side:
handshake (Sec-WebSocket-Accept), frame parsing with client masking,
unmasked server frames, ping/pong, close. Fragmentation is supported for
received frames; sent frames are single-fragment.
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import struct
from typing import Optional, Tuple

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0x0, 0x1, 0x2, 0x8, 0x9, 0xA


def accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(opcode: int, payload: bytes, fin: bool = True) -> bytes:
    header = bytearray()
    header.append((0x80 if fin else 0) | opcode)
    n = len(payload)
    if n < 126:
        header.append(n)
    elif n < 65536:
        header.append(126)
        header += struct.pack(">H", n)
    else:
        header.append(127)
        header += struct.pack(">Q", n)
    return bytes(header) + payload


async def read_frame(reader: asyncio.StreamReader, max_size: int = 64 * 1024 * 1024
                     ) -> Tuple[int, bytes, bool]:
    """Returns (opcode, payload, fin). Raises on EOF / oversized frames."""
    head = await reader.readexactly(2)
    fin = bool(head[0] & 0x80)
    opcode = head[0] & 0x0F
    masked = bool(head[1] & 0x80)
    length = head[1] & 0x7F
    if length == 126:
        (length,) = struct.unpack(">H", await reader.readexactly(2))
    elif length == 127:
        (length,) = struct.unpack(">Q", await reader.readexactly(8))
    if length > max_size:
        raise ValueError(f"frame too large: {length}")
    mask = await reader.readexactly(4) if masked else None
    payload = await reader.readexactly(length)
    if mask:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return opcode, payload, fin


async def read_message(reader: asyncio.StreamReader) -> Optional[Tuple[int, bytes]]:
    """Reassemble one message (handling continuation frames). Returns
    (opcode, payload) or None on clean close. Control frames are returned
    as-is (they may not be fragmented)."""
    opcode = None
    buffer = bytearray()
    while True:
        op, payload, fin = await read_frame(reader)
        if op == OP_CLOSE:
            return None
        if op in (OP_PING, OP_PONG):
            return op, payload
        if op != OP_CONT:
            opcode = op
            buffer = bytearray(payload)
        else:
            buffer += payload
        if fin:
            return opcode if opcode is not None else OP_TEXT, bytes(buffer)


class WebSocket:
    """Server-side websocket wrapper with text/binary send helpers."""

    def __init__(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        self.reader = reader
        self.writer = writer
        self.closed = False

    async def send_text(self, text: str) -> None:
        self.writer.write(encode_frame(OP_TEXT, text.encode()))
        await self.writer.drain()

    async def send_bytes(self, data: bytes) -> None:
        self.writer.write(encode_frame(OP_BINARY, data))
        await self.writer.drain()

    async def recv(self) -> Optional[Tuple[int, bytes]]:
        """Returns (opcode, payload) with pings answered transparently,
        or None once the peer closes."""
        while True:
            try:
                msg = await read_message(self.reader)
            except (asyncio.IncompleteReadError, ConnectionResetError):
                return None
            if msg is None:
                await self.close()
                return None
            op, payload = msg
            if op == OP_PING:
                self.writer.write(encode_frame(OP_PONG, payload))
                await self.writer.drain()
                continue
            if op == OP_PONG:
                continue
            return op, payload

    async def close(self, code: int = 1000) -> None:
        if not self.closed:
            self.closed = True
            try:
                self.writer.write(encode_frame(OP_CLOSE, struct.pack(">H", code)))
                await self.writer.drain()
            except (ConnectionResetError, BrokenPipeError):
                pass
