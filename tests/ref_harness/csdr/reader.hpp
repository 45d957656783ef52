// Minimal csdr-compatible shim for building the reference decoders as a
// golden oracle (the real csdr dependency is unavailable offline). Only
// the API surface the reference uses is provided; buffers are simple
// linear vectors since the harness controls the dataflow.
#pragma once
#include <cstddef>

namespace Csdr {

    template <typename T>
    class Reader {
        public:
            virtual ~Reader() = default;
            virtual size_t available() = 0;
            virtual T* getReadPointer() = 0;
            virtual void advance(size_t how_much) = 0;
    };

}
