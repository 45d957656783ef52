#pragma once
#include <algorithm>
#include <mutex>
// the real csdr headers pull these in transitively; reference sources
// rely on that (e.g. ::roundf, ::pow, malloc)
#include <math.h>
#include <stdlib.h>
#include "reader.hpp"
#include "writer.hpp"
#include "source.hpp"

namespace Csdr {

    template <typename T, typename U>
    class Module: public Source<U> {
        public:
            virtual ~Module() = default;
            virtual void setReader(Reader<T>* reader) { this->reader = reader; }
            virtual bool canProcess() = 0;
            virtual void process() = 0;
        protected:
            Reader<T>* reader = nullptr;
            std::mutex processMutex;
    };

    template <typename T, typename U>
    class AnyLengthModule: public Module<T, U> {
        public:
            bool canProcess() override {
                std::lock_guard<std::mutex> lock(this->processMutex);
                return this->reader->available() > 0
                    && this->writer->writeable() > 0;
            }
            void process() override {
                std::lock_guard<std::mutex> lock(this->processMutex);
                size_t size = std::min(this->reader->available(),
                                       this->writer->writeable());
                process(this->reader->getReadPointer(),
                        this->writer->getWritePointer(), size);
                this->reader->advance(size);
                this->writer->advance(size);
            }
            virtual void process(T* input, U* output, size_t length) = 0;
    };

}
