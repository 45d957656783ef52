#pragma once
#include <vector>
#include "reader.hpp"

namespace Csdr {

    // Linear "ringbuffer": the harness preloads all input, so no wrapping
    // is ever needed.
    template <typename T>
    class Ringbuffer {
        public:
            explicit Ringbuffer(size_t size) { data.reserve(size); }
            void append(const T* src, size_t n) {
                data.insert(data.end(), src, src + n);
            }
            std::vector<T> data;
    };

    template <typename T>
    class RingbufferReader: public Reader<T> {
        public:
            explicit RingbufferReader(Ringbuffer<T>* rb): rb(rb) {}
            size_t available() override { return rb->data.size() - pos; }
            T* getReadPointer() override { return rb->data.data() + pos; }
            void advance(size_t n) override { pos += n; }
        private:
            Ringbuffer<T>* rb;
            size_t pos = 0;
    };

    template <typename T>
    class StdoutWriter; // not used by the harness

}
